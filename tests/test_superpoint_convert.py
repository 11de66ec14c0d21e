"""SuperPoint weight conversion: torch (MagicLeap layout) -> flax backbone.

The torch side replicates the reference forward exactly
(gluefactory_nonfree/superpoint.py:209-236: conv/relu/maxpool encoder,
softmax-minus-dustbin score reshuffle, L2-normalized dense descriptors)
with the reference's layer names, so a real superpoint_v1.pth converts the
same way.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")


def _torch_superpoint(torch):
    nn = torch.nn

    class SP(nn.Module):
        def __init__(self):
            super().__init__()
            c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
            conv = lambda i, o, k, p: nn.Conv2d(i, o, k, stride=1, padding=p)
            self.conv1a = conv(1, c1, 3, 1)
            self.conv1b = conv(c1, c1, 3, 1)
            self.conv2a = conv(c1, c2, 3, 1)
            self.conv2b = conv(c2, c2, 3, 1)
            self.conv3a = conv(c2, c3, 3, 1)
            self.conv3b = conv(c3, c3, 3, 1)
            self.conv4a = conv(c3, c4, 3, 1)
            self.conv4b = conv(c4, c4, 3, 1)
            self.convPa = conv(c4, c5, 3, 1)
            self.convPb = conv(c5, 65, 1, 0)
            self.convDa = conv(c4, c5, 3, 1)
            self.convDb = conv(c5, 256, 1, 0)

        def forward(self, image):
            relu = torch.nn.functional.relu
            pool = lambda x: torch.nn.functional.max_pool2d(x, 2, 2)
            x = relu(self.conv1a(image))
            x = relu(self.conv1b(x))
            x = pool(x)
            x = relu(self.conv2a(x))
            x = relu(self.conv2b(x))
            x = pool(x)
            x = relu(self.conv3a(x))
            x = relu(self.conv3b(x))
            x = pool(x)
            x = relu(self.conv4a(x))
            x = relu(self.conv4b(x))
            cPa = relu(self.convPa(x))
            scores = self.convPb(cPa)
            scores = torch.nn.functional.softmax(scores, 1)[:, :-1]
            b, c, h, w = scores.shape
            scores = scores.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
            scores = scores.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
            cDa = relu(self.convDa(x))
            desc = self.convDb(cDa)
            desc = torch.nn.functional.normalize(desc, p=2, dim=1)
            return scores, desc

    return SP()


@pytest.mark.slow
def test_converted_weights_match_dense_outputs():
    torch = pytest.importorskip("torch")
    from convert_torch_weights import convert_superpoint

    from comet_tpu.models.superpoint import SuperPointBackbone, scores_from_semi

    torch.manual_seed(0)
    sp = _torch_superpoint(torch).eval()
    img = torch.rand(1, 1, 64, 80)
    with torch.no_grad():
        want_scores, want_desc = sp(img)

    model = SuperPointBackbone()
    x = jnp.asarray(img.numpy()).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = convert_superpoint(sp.state_dict(), template)

    semi, desc = model.apply(params, x)
    got_scores = scores_from_semi(semi)

    np.testing.assert_allclose(
        np.asarray(got_scores[0]), want_scores[0].numpy(), atol=2e-5
    )
    # flax desc is NHWC-normalized over the last axis == torch dim=1
    np.testing.assert_allclose(
        np.asarray(desc[0]),
        want_desc[0].permute(1, 2, 0).numpy(),
        atol=2e-5,
    )


def test_prefix_stripping_and_shape_check():
    torch = pytest.importorskip("torch")
    from convert_torch_weights import convert_superpoint

    from comet_tpu.models.superpoint import SuperPointBackbone

    sp = _torch_superpoint(torch)
    model = SuperPointBackbone()
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )
    sd = {f"model.{k}": v for k, v in sp.state_dict().items()}
    params = convert_superpoint(sd, template)
    assert params["params"]["conv1a"]["kernel"].shape == (3, 3, 1, 64)

    bad = dict(sp.state_dict())
    bad.pop("conv1a.weight")
    with pytest.raises(KeyError):
        convert_superpoint(bad, template)
