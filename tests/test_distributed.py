"""Two-process jax.distributed smoke: global mesh, psum, per-host data shards.

Spawns two REAL processes (CPU backend, 4 virtual devices each) that form an
8-device global mesh and run a sharded computation — exercising the
multi-host plumbing (parallel/distributed.py) that a pod slice uses, without
TPU hardware. Skipped if the distributed service cannot bind (sandboxed CI).
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

from hidegs_tpu.parallel.distributed import local_camera_indices
mine = local_camera_indices(10, seed=0)
assert len(mine) == 5

mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
# global array from per-process shards
local = jnp.arange(4, dtype=jnp.float32) + 4 * proc_id
arrs = [jax.device_put(local[i:i+1], d) for i, d in enumerate(jax.local_devices())]
global_x = jax.make_array_from_single_device_arrays(
    (8,), NamedSharding(mesh, P("data")), arrs
)
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(global_x)
expected = sum(range(8))
assert float(total) == expected, float(total)
print(f"proc {proc_id}: OK total={float(total)}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed coordination timed out in this sandbox")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed service unavailable: {out[-300:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out
