"""Harness for importing the REFERENCE torch model from /root/reference.

Used only by the numerical-parity tests (tests/test_torch_parity.py): the
reference modules are instantiated with random weights, their state_dict is
converted with tools/convert_torch_weights.py, and the JAX rebuild must
reproduce the torch forward. Nothing from the reference is copied into the
package — it is imported read-only at test time, exactly like the
reference's own random-weight smoke test (E2Epose2.py:660-825) does.

The reference needs hydra / kornia / torch.hub (DINOv2 download) at import
or call time; this module installs minimal faithful stand-ins:
- hydra.utils.instantiate: resolve `_target_` via importlib (the only
  behavior the reference uses, track_predictor.py:43-54);
- kornia create_meshgrid / dsnt.spatial_expectation2d: the documented
  normalized-grid expectation (used by refine_track.py:259-262);
- torch.hub DINOv2: a locally-built torch ViT-B/14 with registers whose
  parameter names match the dinov2 checkpoint layout the converter maps.
"""

from __future__ import annotations

import importlib
import math
import sys
import types

from _stubs import ModuleOverlay

# Every stub goes through this overlay so uninstall() can restore whatever
# sys.modules held before (test-isolation fix, VERDICT round-2 weak #2).
_OVERLAY = ModuleOverlay()

# NOTE: models/ must come before comet/ so the reference's bare
# `from utils import ...` resolves to comet/models/utils.py (the scripts
# are documented to run from comet/models, README.md:49-66), not the
# comet/utils package.
REF_PATHS = [
    "/root/reference",
    "/root/reference/comet/models",
    "/root/reference/comet",
]


def install(monkeypatch=None):
    """Install sys.path entries and dependency stubs. Idempotent."""
    import torch

    for p in REF_PATHS:
        if p not in sys.path:
            sys.path.append(p)

    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hutils = types.ModuleType("hydra.utils")

        def instantiate(conf, **kwargs):
            conf = {
                k: v for k, v in dict(conf).items()
                if not (k.startswith("_") and k.endswith("_") and k != "_target_")
            }
            target = conf.pop("_target_")
            # strip hydra meta-kwargs (_recursive_, _partial_) — the
            # reference constructors have fixed signatures
            kwargs = {
                k: v for k, v in kwargs.items()
                if not (k.startswith("_") and k.endswith("_"))
            }
            mod, cls = target.rsplit(".", 1)
            return getattr(importlib.import_module(mod), cls)(**conf, **kwargs)

        hutils.instantiate = instantiate
        hydra.utils = hutils
        _OVERLAY.set("hydra", hydra)
        _OVERLAY.set("hydra.utils", hutils)

    # models/utils.py does `from train_eval_func import QuaternionCameras`,
    # and train_eval_func.py needs full pytorch3d + lightglue + tqdm. Load
    # ONLY the QuaternionCameras class by exec'ing its source slice from the
    # reference file (read-only, nothing copied into the repo).
    if "train_eval_func" not in sys.modules:
        import re

        from minipytorch3d.cameras import get_world_to_view_transform
        from minipytorch3d.rotation_conversions import quaternion_to_matrix
        from minipytorch3d.transform3d import Transform3d

        def extract_qc(path, modname):
            src = open(path).read()
            m = re.search(r"^class QuaternionCameras.*?(?=^\S)", src, re.M | re.S)
            ns = {
                "torch": torch,
                "quaternion_to_matrix": quaternion_to_matrix,
                "Transform3d": Transform3d,
                "get_world_to_view_transform": get_world_to_view_transform,
            }
            exec(compile(m.group(0), f"{modname}:QuaternionCameras", "exec"), ns)
            return ns["QuaternionCameras"]

        # utils.py imports the OLD class (train_eval_func.py:113, no T_uvz);
        # the harness uses the new_cp5 variant (with T_uvz/ratio) as gt input
        mod = types.ModuleType("train_eval_func")
        mod.QuaternionCameras = extract_qc(
            "/root/reference/comet/models/train_eval_func.py", "train_eval_func"
        )
        mod.QuaternionCamerasCP5 = extract_qc(
            "/root/reference/comet/models/train_eval_func_new_cp5.py",
            "train_eval_func_new_cp5",
        )
        _OVERLAY.set("train_eval_func", mod)

    if "kornia" not in sys.modules:
        def create_meshgrid(
            height, width, normalized_coordinates=True, device=None, dtype=None
        ):
            if normalized_coordinates:
                xs = torch.linspace(-1.0, 1.0, width, device=device, dtype=dtype)
                ys = torch.linspace(-1.0, 1.0, height, device=device, dtype=dtype)
            else:
                xs = torch.arange(width, device=device, dtype=dtype)
                ys = torch.arange(height, device=device, dtype=dtype)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], dim=-1).unsqueeze(0)  # [1, H, W, 2]

        def spatial_expectation2d(input, normalized_coordinates=True):
            b, c, h, w = input.shape
            grid = create_meshgrid(
                h, w, normalized_coordinates, input.device, input.dtype
            ).reshape(1, 1, h * w, 2)
            probs = input.reshape(b, c, h * w, 1)
            return (probs * grid).sum(dim=2)  # [B, C, 2]

        kornia = types.ModuleType("kornia")
        kutils = types.ModuleType("kornia.utils")
        kgrid = types.ModuleType("kornia.utils.grid")
        kgeom = types.ModuleType("kornia.geometry")
        ksub = types.ModuleType("kornia.geometry.subpix")
        kdsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
        kgrid.create_meshgrid = create_meshgrid
        kutils.grid = kgrid
        kdsnt.spatial_expectation2d = spatial_expectation2d
        ksub.dsnt = kdsnt
        kgeom.subpix = ksub
        kornia.utils = kutils
        kornia.geometry = kgeom
        for name, mod in [
            ("kornia", kornia),
            ("kornia.utils", kutils),
            ("kornia.utils.grid", kgrid),
            ("kornia.geometry", kgeom),
            ("kornia.geometry.subpix", ksub),
            ("kornia.geometry.subpix.dsnt", kdsnt),
        ]:
            _OVERLAY.set(name, mod)


def install_harness():
    """Extra stubs so the reference's OWN eval harness module
    (train_eval_func_new_cp5.py) and model class (E2Epose2.COMET) import
    and run in this environment (harness-vs-harness parity, VERDICT
    round-2 item 1). Call after install(). Idempotent.

    Stubbed: torchvision / omegaconf / full pytorch3d (absent from this
    image; only type hints and random_quaternions are touched at eval
    time), lightglue (replaced by an injectable fake extractor so both
    harnesses consume IDENTICAL query points), and train_util (its import
    block is broken-as-shipped — `from imc import IMCDataset`,
    SURVEY.md §1 — so the four functions the harness chain needs are
    exec'd read-only from the reference source instead).
    """
    import re

    import torch

    install()

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        _OVERLAY.set("torchvision", tv)
        _OVERLAY.set("torchvision.transforms", tvt)
        _OVERLAY.set("torchvision.transforms.functional", tvf)

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def set_struct(cfg, flag):
                pass

            @staticmethod
            def to_yaml(cfg):
                return str(cfg)

        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        _OVERLAY.set("omegaconf", oc)

    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        p3dt = types.ModuleType("pytorch3d.transforms")

        def random_quaternions(n, dtype=None, device=None):
            q = torch.randn(n, 4, dtype=dtype, device=device)
            return q / q.norm(dim=-1, keepdim=True)

        p3dt.random_quaternions = random_quaternions
        p3dr = types.ModuleType("pytorch3d.renderer")
        p3drc = types.ModuleType("pytorch3d.renderer.cameras")

        class CamerasBase:  # type-hint only in E2Epose2
            pass

        p3drc.CamerasBase = CamerasBase
        p3dr.cameras = p3drc
        p3d.transforms = p3dt
        p3d.renderer = p3dr
        _OVERLAY.set("pytorch3d", p3d)
        _OVERLAY.set("pytorch3d.transforms", p3dt)
        _OVERLAY.set("pytorch3d.renderer", p3dr)
        _OVERLAY.set("pytorch3d.renderer.cameras", p3drc)

    if "lightglue" not in sys.modules:
        lg = types.ModuleType("lightglue")

        class _FakeExtractor:
            """Injectable detector: set `points` ([N, 2] torch) per test so
            the reference harness seeds the exact same query points as
            ours. .cuda()/.eval() are the chainable no-ops the harness
            calls (train_eval_func_new_cp5.py:527-531)."""

            points: "torch.Tensor | None" = None

            def __init__(self, **kw):
                pass

            def cuda(self):
                return self

            def eval(self):
                return self

            def extract(self, img):
                pts = type(self).points
                if pts is None:
                    pts = torch.zeros(0, 2)
                return {"keypoints": pts[None]}

        class SuperPoint(_FakeExtractor):
            points = None

        class SIFT(_FakeExtractor):
            points = torch.zeros(0, 2)

        lg.SuperPoint = SuperPoint
        lg.SIFT = SIFT
        _OVERLAY.set("lightglue", lg)

    if "train_util" not in sys.modules:
        src = open("/root/reference/comet/models/train_util.py").read()

        def extract_fn(name):
            m = re.search(rf"^def {name}\(.*?(?=^\S)", src, re.M | re.S)
            return m.group(0)

        import numpy as np
        import psutil

        ns = {"torch": torch, "np": np, "numpy": np, "psutil": psutil,
              "os": __import__("os")}
        for fn in ("check_ni", "process_spark_data", "process_spark_data2",
                   "record_and_print_cpu_memory_and_usage"):
            exec(compile(extract_fn(fn), f"train_util:{fn}", "exec"), ns)
        mod = types.ModuleType("train_util")
        for fn in ("check_ni", "process_spark_data", "process_spark_data2",
                   "record_and_print_cpu_memory_and_usage"):
            setattr(mod, fn, ns[fn])

        def set_seed_and_print(seed):  # logging-only utility
            torch.manual_seed(seed)

        mod.set_seed_and_print = set_seed_and_print
        _OVERLAY.set("train_util", mod)


def uninstall():
    """Reverse install()/install_harness(): restore the sys.modules entries
    the stubs overwrote, drop every module imported from /root/reference,
    and remove the REF_PATHS sys.path entries. After this the interpreter
    looks exactly as if no parity test had run (test-isolation fix)."""
    _OVERLAY.restore()
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if isinstance(f, str) and f.startswith("/root/reference"):
            del sys.modules[name]
    for p in REF_PATHS:
        while p in sys.path:
            sys.path.remove(p)


def build_torch_dinov2(img_size=336, depth=12, embed_dim=768, num_heads=12,
                       num_registers=4, patch=14, seed=0, pos_grid=None):
    """A torch ViT-B/14-with-registers whose state_dict uses the dinov2
    checkpoint naming (patch_embed.proj, blocks.N.attn.qkv, ls1.gamma,
    register_tokens, ...) and whose forward_features returns
    {"x_norm_patchtokens": ...} like torch.hub dinov2_vitb14_reg.

    Built locally (no network); weights random. Faithful to the published
    DINOv2 architecture: pre-norm blocks, LayerScale on both branches,
    exact-GELU MLP, final LayerNorm, cls + register tokens.

    ``pos_grid``: grid at which pos_embed is STORED. The real vitb14_reg
    checkpoint stores 37x37 (518px pretraining) and interpolates to the
    runtime grid in forward (interpolate_pos_encoding, bicubic
    antialias=False) — pass pos_grid=37 to exercise exactly that layout;
    the torch->flax converter resamples the same way offline.
    """
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    grid = img_size // patch
    store_grid = pos_grid or grid

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(embed_dim, eps=1e-6)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(embed_dim, 3 * embed_dim)
            self.attn.proj = nn.Linear(embed_dim, embed_dim)
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(1e-5 * torch.ones(embed_dim))
            self.norm2 = nn.LayerNorm(embed_dim, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(embed_dim, 4 * embed_dim)
            self.mlp.fc2 = nn.Linear(4 * embed_dim, embed_dim)
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(1e-5 * torch.ones(embed_dim))

        def forward(self, x):
            b, n, c = x.shape
            h = num_heads
            y = self.norm1(x)
            qkv = self.attn.qkv(y).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
            att = att.softmax(dim=-1)
            y = (att @ v).transpose(1, 2).reshape(b, n, c)
            x = x + self.ls1.gamma * self.attn.proj(y)
            y = self.norm2(x)
            y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
            return x + self.ls2.gamma * y

    class DinoV2(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch, stride=patch)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.register_tokens = nn.Parameter(
                torch.zeros(1, num_registers, embed_dim)
            )
            # stored at store_grid (37x37 for the real-checkpoint layout;
            # defaults to the runtime grid for the small parity tests)
            self.pos_embed = nn.Parameter(
                0.02 * torch.randn(1, store_grid * store_grid + 1, embed_dim)
            )
            self.blocks = nn.ModuleList([Block() for _ in range(depth)])
            self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
            with torch.no_grad():
                self.cls_token.normal_(0, 0.02)
                self.register_tokens.normal_(0, 0.02)

        def forward_features(self, x):
            import torch.nn.functional as F

            b = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
            pos = self.pos_embed
            if store_grid != grid:
                # dinov2 interpolate_pos_encoding: bicubic, antialias=False
                t = pos[:, 1:].reshape(1, store_grid, store_grid, embed_dim)
                t = t.permute(0, 3, 1, 2)
                t = F.interpolate(t, (grid, grid), mode="bicubic",
                                  antialias=False)
                t = t.permute(0, 2, 3, 1).reshape(1, grid * grid, embed_dim)
                pos = torch.cat([pos[:, :1], t], dim=1)
            x = x + pos
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(b, -1, -1), x[:, 1:]],
                dim=1,
            )
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
            return {"x_norm_patchtokens": x[:, 1 + num_registers:]}

        def forward(self, x, is_training=False):
            # the reference calls backbone(x, is_training=True) and reads
            # x_norm_patchtokens from the returned dict (dinov2 API)
            return self.forward_features(x)

    return DinoV2().eval()
