"""Multi-process data-parallel proof (VERDICT r2 item 3).

Launches 2 OS processes that join a JAX distributed cluster over localhost
(CPU backend, ``jax.distributed.initialize``), each running ``fit_epoch``
with ``process_local_order`` striding over a shared on-disk fixture, and
asserts the final parameters equal a single-process run with the same
global batch — the role the reference fills with multi-node DDP
(gluefactory/train.py:237-241,682-688) and HF Accelerate
(comet/models/train_e2epose2.py:47,83).

Why the results must agree exactly (up to f32 reduction rounding): with
global batch 2, single-process step i consumes ``order[2i:2i+2]`` on a
2-device local mesh, while each of the 2 processes consumes
``order[p::2][i] = order[2i+p]`` on a 2-device GLOBAL mesh — the same
sample set, the same mean-gradient psum over 2 devices.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_TESTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TESTS)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nprocs, port, fixture, out, epochs, n_local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = []
    for pid in range(nprocs):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(_TESTS, "_mp_worker.py"),
                    str(pid), str(nprocs), str(port), fixture, out,
                    str(epochs),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                cwd=_REPO,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{log[-4000:]}"
    return logs


def test_two_process_matches_single_process(tmp_path):
    from comet_tpu.data.fixtures import generate_amd_fixture

    root = str(tmp_path)
    generate_amd_fixture(os.path.join(root, "AMD_train"), n_models=1,
                         n_seqs=4, n_frames=6, img_hw=(96, 96))

    single = str(tmp_path / "single.npz")
    multi = str(tmp_path / "multi.npz")

    # single process, 2 local devices (global batch 2 per step)
    _run_workers(1, _free_port(), root, single, epochs=2, n_local_devices=2)
    # 2 processes x 1 device each: same 2-device global mesh over DCN
    _run_workers(2, _free_port(), root, multi, epochs=2, n_local_devices=1)

    a = np.load(single)
    b = np.load(multi)
    assert set(a.files) == set(b.files)
    worst = 0.0
    for k in a.files:
        d = float(np.max(np.abs(a[k] - b[k]))) if a[k].size else 0.0
        worst = max(worst, d)
        np.testing.assert_allclose(a[k], b[k], atol=5e-5, err_msg=k)
    print(f"2-process == 1-process: {len(a.files)} tensors, "
          f"max |diff| = {worst:.2e}")
