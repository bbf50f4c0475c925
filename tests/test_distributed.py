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


# ---------------------------------------------------------------------------
# 4-process multi-slice (DCN-topology) smoke: the pod-scale story beyond a
# 2-rank handshake (VERDICT-r3 item 10).  Two virtual 2-process slices run the
# REAL FSDP+TP train step (train.lm.make_train_step) over a (replica=2,
# data=2, model=2) create_dcn_mesh: batch rows shard over (replica, data) —
# one row per process — params shard over (data, model) and replicate across
# slices, so the only cross-slice collective is the grad all-reduce, exactly
# the layout a 2-slice DCN pod would run.  Losses must agree across all 4
# ranks AND match a single-process run of the same global program.
# ---------------------------------------------------------------------------

_DCN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from usdm_tpu.core import distributed as D

coord, pid = sys.argv[1], int(sys.argv[2])
D.initialize(coordinator_address=coord, num_processes=4, process_id=pid)
info = D.process_info()
assert info["process_count"] == 4, info
assert info["global_devices"] == 8 and info["local_devices"] == 2, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import MistralConfig, TrainConfig
from usdm_tpu.core.mesh import create_dcn_mesh
from usdm_tpu.data.collators import pack_collate
from usdm_tpu.train import lm as T

cfg = MistralConfig.tiny(vocab_size=128)
tc = TrainConfig(batch_size=4, max_steps=8, remat=True)
mesh = create_dcn_mesh(num_slices=2, dp=2, tp=2)
assert mesh.devices.shape == (2, 2, 2)

rng = np.random.default_rng(7)
rows = []
for _ in range(4):
    a = rng.integers(2, cfg.vocab_size, size=15)
    c = rng.integers(2, cfg.vocab_size, size=15)
    rows.append([1] + a.tolist() + [1] + c.tolist())
batch_np = pack_collate(rows, pad_id=0, bos_id=1)

bspec = T.batch_spec(mesh)
batch = {
    k: jax.make_array_from_process_local_data(
        NamedSharding(mesh, bspec[k]), np.asarray(v)[pid:pid + 1])
    for k, v in batch_np.items()
}

state, _ = T.init_state(cfg, tc, mesh, jax.random.PRNGKey(0))
step = T.make_train_step(cfg, tc, mesh, attn_impl="xla")
for i in range(2):
    state, metrics = step(state, batch)
    print(f"proc{pid} step{i} loss={float(metrics['loss']):.6f}", flush=True)
print(f"proc{pid} OK", flush=True)
"""


def test_four_process_dcn_train_step():
    import re

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_", "JAX_"))}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DCN_WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=repo,
        )
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    losses = {}  # step -> set of per-rank losses
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out, out
        for st, val in re.findall(rf"proc{pid} step(\d) loss=([\d.]+)", out):
            losses.setdefault(int(st), set()).add(val)
    assert set(losses) == {0, 1}, losses
    for st, vals in losses.items():
        assert len(vals) == 1, f"ranks disagree at step {st}: {vals}"

    # golden: the same global program single-process on the 8-device CPU mesh
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    from usdm_tpu.core.config import MistralConfig, TrainConfig
    from usdm_tpu.core.mesh import create_dcn_mesh
    from usdm_tpu.data.collators import pack_collate
    from usdm_tpu.train import lm as T

    cfg = MistralConfig.tiny(vocab_size=128)
    tc = TrainConfig(batch_size=4, max_steps=8, remat=True)
    mesh = create_dcn_mesh(num_slices=2, dp=2, tp=2)
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(4):
        a = rng.integers(2, cfg.vocab_size, size=15)
        c = rng.integers(2, cfg.vocab_size, size=15)
        rows.append([1] + a.tolist() + [1] + c.tolist())
    batch_np = pack_collate(rows, pad_id=0, bos_id=1)
    bspec = T.batch_spec(mesh)
    batch = {k: jax.device_put(np.asarray(v), NamedSharding(mesh, bspec[k]))
             for k, v in batch_np.items()}
    state, _ = T.init_state(cfg, tc, mesh, jax.random.PRNGKey(0))
    step = T.make_train_step(cfg, tc, mesh, attn_impl="xla")
    for i in range(2):
        state, metrics = step(state, batch)
        golden = float(metrics["loss"])
        got = float(next(iter(losses[i])))
        np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)
