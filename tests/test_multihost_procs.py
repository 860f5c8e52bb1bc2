"""REAL multi-process distributed test: 2 OS processes x 4 virtual CPU
devices each form one 8-device global mesh over gloo, exercising
parallel/distributed.py (initialize + gather_metrics + is_main_process),
FSDP-style sharded computation with cross-process collectives, and
per-host sharded batch assembly — the multi-host story that the simulated
single-process mesh tests cannot cover (ROADMAP 'Multi-host' gap).

The reference's equivalent surface is the DeepSpeed launcher + NCCL/gloo
process group (scripts/finetune.sh:60, handsonvlm_trainer.py:241-251);
there is no reference test for it at all (SURVEY §4: no test suite).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from handsonvlm_tpu.parallel import distributed

    port = sys.argv[1]
    pid = int(sys.argv[2])
    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert distributed.is_main_process() == (pid == 0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8, len(devs)  # 4 local x 2 processes
    mesh = Mesh(np.array(devs).reshape(8), ("data",))

    # global batch sharded over all 8 devices, each host materializing only
    # its addressable half (per-host sharded loading, train/loader.py idea)
    sharding = NamedSharding(mesh, P("data"))
    global_shape = (8, 16)
    local_rows = np.arange(global_shape[1], dtype=np.float32)[None] + np.array(
        [4 * pid + r for r in range(4)], np.float32)[:, None]
    arrs = [
        jax.device_put(local_rows[i][None], d)
        for i, d in enumerate(jax.local_devices())
    ]
    batch = jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)

    w = jnp.full((16, 4), 0.5, jnp.float32)  # replicated param

    @jax.jit
    def step(x, w):
        y = x @ w                       # row-sharded matmul
        return y, jnp.sum(y)            # sum -> cross-process reduce

    y, total = step(batch, w)
    # expected: sum over rows r in 0..7 of sum((arange(16)+r) * 0.5 * 4)
    exp = sum(float(np.sum((np.arange(16) + r) * 0.5 * 4)) for r in range(8))
    np.testing.assert_allclose(float(total), exp, rtol=1e-6)

    # eval-metric gather across processes (accelerator.gather equivalent)
    g = distributed.gather_metrics({"ade": np.array([float(pid)])})
    np.testing.assert_allclose(np.sort(g["ade"].ravel()), [0.0, 1.0])
    print(f"MULTIHOST_OK {pid}", flush=True)
""")


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
            assert p.returncode == 0, f"proc {i}:\n{outs[-1][-2000:]}"
            assert f"MULTIHOST_OK {i}" in outs[-1], outs[-1][-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
