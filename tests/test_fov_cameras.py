"""Golden tests: the FoV/Orthographic camera family vs the reference
minipytorch3d implementations (cameras.py:510,793,1273;
renderer_utils.py:355-439), imported read-only via _torch_ref.install().

Every comparison feeds both sides the same random rotations/translations/
points and diffs NDC projections, screen projections, unprojections, and
ndc_grid_sample outputs. The repo side uses row-vector transforms and
channel-last tensors; the reference is column-major torch — agreement here
certifies the transposition conventions, not just the formulas.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import _torch_ref

from comet_tpu.geometry.fov_cameras import (
    FoVOrthographicCameras,
    FoVPerspectiveCameras,
    OrthographicCameras,
    ndc_grid_sample,
    ndc_to_grid_sample_coords,
    ndc_to_screen_transform,
    screen_to_ndc_transform,
)

pytestmark = pytest.mark.fast

_torch_ref.install()

from minipytorch3d import cameras as ref_cams  # noqa: E402
from minipytorch3d import renderer_utils as ref_ru  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _random_rt(rng, n):
    """Random proper rotations + translations pushing points to z>0."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    r = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(n, 3, 3)
    t = rng.normal(size=(n, 3)) * 0.3
    t[:, 2] += 5.0
    return r.astype(np.float32), t.astype(np.float32)


def _points(rng, m=17):
    p = rng.normal(size=(m, 3)) * 0.8
    return p.astype(np.float32)


class TestFoVPerspective:
    def test_projection_matrix(self, rng):
        znear, zfar = 0.7, 55.0
        fov = np.asarray([35.0, 60.0, 88.0], np.float32)
        aspect = np.asarray([1.0, 1.3, 0.8], np.float32)
        ref = ref_cams.FoVPerspectiveCameras(
            znear=znear, zfar=zfar,
            fov=torch.from_numpy(fov), aspect_ratio=torch.from_numpy(aspect),
        )
        k_ref = ref.compute_projection_matrix(
            znear=torch.full((3,), znear), zfar=torch.full((3,), zfar),
            fov=torch.from_numpy(fov),
            aspect_ratio=torch.from_numpy(aspect), degrees=True,
        ).numpy()
        ours = FoVPerspectiveCameras.create(
            znear=znear, zfar=zfar, fov=fov, aspect_ratio=aspect
        )
        # reference K is column-major (x' = K @ x); ours row-vector
        np.testing.assert_allclose(
            np.asarray(ours.k), np.swapaxes(k_ref, -1, -2), atol=1e-5
        )

    def test_transform_points_ndc_and_screen(self, rng):
        n = 3
        r, t = _random_rt(rng, n)
        pts = _points(rng)
        ref = ref_cams.FoVPerspectiveCameras(
            znear=0.5, zfar=40.0, fov=48.0,
            R=torch.from_numpy(r), T=torch.from_numpy(t),
        )
        ndc_ref = (
            ref.get_full_projection_transform()
            .transform_points(torch.from_numpy(pts))
            .numpy()
        )
        ours = FoVPerspectiveCameras.create(
            znear=np.full((n,), 0.5, np.float32), zfar=40.0, fov=48.0,
            r=jnp.asarray(r), t=jnp.asarray(t),
        )
        ndc = np.asarray(ours.transform_points(jnp.asarray(pts)))
        np.testing.assert_allclose(ndc, ndc_ref, atol=2e-4)

        scr_ref = ref.transform_points_screen(
            torch.from_numpy(pts), image_size=((96, 128),)
        ).numpy()
        scr = np.asarray(
            ours.transform_points_screen(jnp.asarray(pts), (96, 128))
        )
        np.testing.assert_allclose(scr, scr_ref, atol=2e-3)

    @pytest.mark.parametrize("scaled", [False, True])
    @pytest.mark.parametrize("world", [False, True])
    def test_unproject_roundtrip(self, rng, world, scaled):
        n = 2
        r, t = _random_rt(rng, n)
        ref = ref_cams.FoVPerspectiveCameras(
            znear=0.8, zfar=30.0, fov=55.0,
            R=torch.from_numpy(r), T=torch.from_numpy(t),
        )
        xy_depth = np.concatenate(
            [
                rng.uniform(-0.7, 0.7, size=(n, 9, 2)),
                rng.uniform(0.4 if scaled else 2.0,
                            0.9 if scaled else 12.0, size=(n, 9, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        got_ref = ref.unproject_points(
            torch.from_numpy(xy_depth),
            world_coordinates=world, scaled_depth_input=scaled,
        ).numpy()
        ours = FoVPerspectiveCameras.create(
            znear=np.full((n,), 0.8, np.float32), zfar=30.0, fov=55.0,
            r=jnp.asarray(r), t=jnp.asarray(t),
        )
        got = np.asarray(
            ours.unproject_points(
                jnp.asarray(xy_depth),
                world_coordinates=world, scaled_depth_input=scaled,
            )
        )
        np.testing.assert_allclose(got, got_ref, atol=3e-4)


class TestFoVOrthographic:
    def test_projection_and_points(self, rng):
        n = 2
        r, t = _random_rt(rng, n)
        pts = _points(rng)
        kw = dict(znear=0.6, zfar=25.0, max_y=1.4, min_y=-0.9,
                  max_x=1.1, min_x=-1.2)
        ref = ref_cams.FoVOrthographicCameras(
            R=torch.from_numpy(r), T=torch.from_numpy(t),
            scale_xyz=((1.2, 0.9, 1.05),), **kw,
        )
        ndc_ref = (
            ref.get_full_projection_transform()
            .transform_points(torch.from_numpy(pts))
            .numpy()
        )
        ours = FoVOrthographicCameras.create(
            scale_xyz=(1.2, 0.9, 1.05),
            r=jnp.asarray(r), t=jnp.asarray(t),
            znear=np.full((n,), 0.6, np.float32),
            **{k: v for k, v in kw.items() if k != "znear"},
        )
        ndc = np.asarray(ours.transform_points(jnp.asarray(pts)))
        np.testing.assert_allclose(ndc, ndc_ref, atol=2e-5)

    @pytest.mark.parametrize("scaled", [False, True])
    def test_unproject(self, rng, scaled):
        n = 2
        r, t = _random_rt(rng, n)
        ref = ref_cams.FoVOrthographicCameras(
            znear=0.5, zfar=18.0,
            R=torch.from_numpy(r), T=torch.from_numpy(t),
        )
        xy_depth = np.concatenate(
            [
                rng.uniform(-0.8, 0.8, size=(n, 7, 2)),
                rng.uniform(0.1 if scaled else 1.0,
                            0.9 if scaled else 9.0, size=(n, 7, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        got_ref = ref.unproject_points(
            torch.from_numpy(xy_depth),
            world_coordinates=True, scaled_depth_input=scaled,
        ).numpy()
        ours = FoVOrthographicCameras.create(
            znear=np.full((n,), 0.5, np.float32), zfar=18.0,
            r=jnp.asarray(r), t=jnp.asarray(t),
        )
        got = np.asarray(
            ours.unproject_points(
                jnp.asarray(xy_depth),
                world_coordinates=True, scaled_depth_input=scaled,
            )
        )
        np.testing.assert_allclose(got, got_ref, atol=2e-4)


class TestOrthographicSfM:
    def test_points_and_unproject(self, rng):
        n = 2
        r, t = _random_rt(rng, n)
        pts = _points(rng)
        focal = np.asarray([[1.5, 1.7], [0.9, 1.1]], np.float32)
        pp = np.asarray([[0.05, -0.1], [0.0, 0.2]], np.float32)
        ref = ref_cams.OrthographicCameras(
            focal_length=torch.from_numpy(focal),
            principal_point=torch.from_numpy(pp),
            R=torch.from_numpy(r), T=torch.from_numpy(t),
        )
        ndc_ref = (
            ref.get_full_projection_transform()
            .transform_points(torch.from_numpy(pts))
            .numpy()
        )
        ours = OrthographicCameras.create(
            focal_length=focal, principal_point=pp,
            r=jnp.asarray(r), t=jnp.asarray(t),
        )
        ndc = np.asarray(ours.transform_points(jnp.asarray(pts)))
        np.testing.assert_allclose(ndc, ndc_ref, atol=2e-5)

        xy_depth = ndc_ref.astype(np.float32)
        got_ref = ref.unproject_points(
            torch.from_numpy(xy_depth), world_coordinates=True
        ).numpy()
        got = np.asarray(
            ours.unproject_points(jnp.asarray(xy_depth), world_coordinates=True)
        )
        np.testing.assert_allclose(got, got_ref, atol=2e-4)
        # unprojecting its own projection must return the world points
        np.testing.assert_allclose(
            got, np.broadcast_to(pts, got.shape), atol=2e-4
        )


class TestNdcScreenTransforms:
    @pytest.mark.parametrize("image_size", [(64, 64), (48, 80), (80, 48)])
    @pytest.mark.parametrize("with_xyflip", [False, True])
    def test_ndc_to_screen(self, rng, image_size, with_xyflip):
        pts = rng.uniform(-1, 1, size=(2, 11, 3)).astype(np.float32)
        ref_tr = ref_cams.get_ndc_to_screen_transform(
            ref_cams.FoVPerspectiveCameras(R=torch.eye(3)[None].repeat(2, 1, 1)),
            with_xyflip=with_xyflip, image_size=image_size,
        )
        ref_out = ref_tr.transform_points(torch.from_numpy(pts)).numpy()
        ours = ndc_to_screen_transform(2, image_size, with_xyflip=with_xyflip)
        got = np.asarray(ours.transform_points(jnp.asarray(pts)))
        np.testing.assert_allclose(got, ref_out, atol=1e-4)

        # inverse round-trips
        back = np.asarray(
            screen_to_ndc_transform(2, image_size, with_xyflip=with_xyflip)
            .transform_points(jnp.asarray(got))
        )
        np.testing.assert_allclose(back, pts, atol=1e-4)


class TestNdcGridSample:
    @pytest.mark.parametrize("hw", [(32, 32), (24, 40), (40, 24)])
    def test_matches_reference(self, rng, hw):
        h, w = hw
        b, c, m = 2, 5, 13
        feats = rng.normal(size=(b, c, h, w)).astype(np.float32)
        # stay interior so zeros-padding edge handling can't differ
        grid = rng.uniform(-0.6, 0.6, size=(b, m, 2)).astype(np.float32)

        ref_out = ref_ru.ndc_grid_sample(
            torch.from_numpy(feats), torch.from_numpy(grid),
            align_corners=False,
        ).numpy()  # [B, C, M]
        got = np.asarray(
            ndc_grid_sample(
                jnp.asarray(np.transpose(feats, (0, 2, 3, 1))),
                jnp.asarray(grid), align_corners=False,
            )
        )  # [B, M, C]
        np.testing.assert_allclose(
            np.transpose(got, (0, 2, 1)), ref_out, atol=1e-5
        )

    def test_coord_conversion(self, rng):
        xy = rng.uniform(-1, 1, size=(3, 9, 2)).astype(np.float32)
        for hw in [(20, 30), (30, 20), (16, 16)]:
            ref_out = ref_ru.ndc_to_grid_sample_coords(
                torch.from_numpy(xy), hw
            ).numpy()
            got = np.asarray(ndc_to_grid_sample_coords(jnp.asarray(xy), hw))
            np.testing.assert_allclose(got, ref_out, atol=1e-6)
