"""Multi-process jax.distributed smoke: 2 local processes x 4 CPU devices.

Exercises core.distributed.initialize the way a 2-host pod launch would
(SURVEY §6 / VERDICT weak-item: 'dryrun could at least simulate 2 processes x
4 devices'): both processes join one coordinator, see 8 global devices, and a
shard_map psum over the global mesh returns the cross-process total.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from usdm_tpu.core import distributed as D

coord, pid = sys.argv[1], int(sys.argv[2])
D.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
info = D.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8 and info["local_devices"] == 4, info
assert D.is_primary() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
# every process contributes its local shard values = its process_id + 1
local = np.full((4, 2), pid + 1, np.float32)
garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local)

@jax.jit
def total(x):
    return shard_map(lambda s: jax.lax.psum(s.sum(), "data"),
                     mesh=mesh, in_specs=P("data"), out_specs=P())(x)

out = float(total(garr))
assert out == (1 + 2) * 4 * 2 / 2 * 2, out  # 4 rows x 2 cols of 1s + of 2s = 24
print(f"proc{pid} OK total={out}", flush=True)
"""


def test_two_process_initialize(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_", "JAX_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK total=24.0" in out, out
