"""Multi-host (DCN-tier) smoke test: a real 2-process jax.distributed
cluster on CPU drives multihost.initialize + make_pod_mesh +
distributed_bundle_adjust.

The reference has no multi-node anything (SURVEY.md §2.3); this exercises
the framework's DCN code path end to end — coordinator handshake, global
device view (2 processes x 4 local devices -> (2, 4) pod mesh), and one
cross-process sharded BA solve whose result must agree bit-for-bit on
every process (SPMD).
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
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from photogrammetry_tpu.parallel import multihost
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # global view
assert len(jax.local_devices()) == 4

mesh = multihost.make_pod_mesh()
assert mesh.devices.shape == (2, 4), mesh.devices.shape
assert mesh.axis_names == ("submaps", "tracks")

import numpy as np
import jax.numpy as jnp
from photogrammetry_tpu.sfm.ba import BAState, BAProblem, project
from photogrammetry_tpu.parallel.dist_ba import distributed_bundle_adjust
from jax.sharding import Mesh

# The BA "tracks" psum rides the per-host axis; build a (tracks,)-only
# mesh over the full global device set for the smoke solve.
flat = Mesh(mesh.devices.reshape(-1), ("tracks",))

rng = np.random.default_rng(0)
f, t = 4, 64
k = jnp.array([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]])
pts = jnp.asarray(rng.uniform(-1, 1, (t, 3)) + [0, 0, 5], jnp.float32)
rs = jnp.tile(jnp.eye(3)[None], (f, 1, 1))
ts = jnp.asarray(rng.normal(0, 0.05, (f, 3)), jnp.float32)
obs, _, _ = project(rs, ts, pts, k)
state = BAState(rs=rs, ts=ts,
                points=pts + jnp.asarray(rng.normal(0, 0.03, (t, 3)),
                                         jnp.float32))
prob = BAProblem(obs=obs, mask=jnp.ones((f, t), bool), k=k)
res = distributed_bundle_adjust(state, prob, flat, num_iterations=8)
c0, c1 = float(res.initial_cost), float(res.cost)
assert c1 < 0.1 * c0, (c0, c1)
print(f"RESULT {proc_id} {c0:.8e} {c1:.8e}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, c0, c1 = line.split()
                results[pid] = (c0, c1)
    assert set(results) == {"0", "1"}
    # SPMD: both processes computed the identical global solve
    assert results["0"] == results["1"]
