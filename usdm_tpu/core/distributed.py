"""Multi-host initialization and failure handling.

Replaces the reference's rank/env plumbing + NCCL process groups
(/root/reference/src/decoder/scripts/train.py:30-49, accelerate multi-machine
launch, src/README.md:25-31) with `jax.distributed.initialize`: one call per
host and every jitted program spans the whole slice (ICI) or multi-slice pod
(DCN) via the same mesh/sharding code used single-host.

Failure story (SURVEY.md §6): the reference tears the process group down and
relies on checkpoint resume; here `guarded_training` snapshots an emergency
orbax checkpoint on any exception before re-raising, and resume-by-latest-step
is built into the train CLIs.
"""

from __future__ import annotations

import contextlib
import os
import traceback
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  With no args, reads the standard cluster
    env (TPU pods auto-discover; GKE/JobSet set the variables)."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # single-process runs (tests, one-host dev) are fine without it
        if "already initialized" not in str(e):
            raise


def add_cli_args(p) -> None:
    """Attach the standard multi-host launch flags to a train CLI parser —
    the analog of the reference's accelerate `--main_process_ip /
    --machine_rank` recipe (/root/reference/src/README.md:25-31)."""
    g = p.add_argument_group("distributed (multi-host launch)")
    g.add_argument("--coordinator", default=None,
                   help="rank-0 host:port; omit on TPU pods (auto-discovery)")
    g.add_argument("--num_processes", type=int, default=None,
                   help="total process count (one per host)")
    g.add_argument("--process_id", type=int, default=None,
                   help="this host's rank in [0, num_processes)")
    g.add_argument("--num_slices", type=int, default=1,
                   help="multi-slice pods: >1 builds a (replica, data, model) "
                        "DCN mesh (core.mesh.create_dcn_mesh) — DP across "
                        "slices, FSDP/TP within")


def initialize_from_args(args) -> None:
    """Call `initialize` iff the CLI flags (or a >1-process env) ask for it."""
    if args.coordinator is not None or (args.num_processes or 0) > 1:
        initialize(args.coordinator, args.num_processes, args.process_id)


def make_cli_mesh(args):
    """Build the train mesh a CLI asked for: single-slice (data, model) or,
    with --num_slices > 1, the multi-slice (replica, data, model) layout."""
    from usdm_tpu.core.mesh import create_dcn_mesh, create_mesh

    tp = getattr(args, "tp", 1)
    dp = getattr(args, "dp", -1)
    if args.num_slices > 1:
        return create_dcn_mesh(num_slices=args.num_slices, dp=dp, tp=tp)
    return create_mesh(dp=dp, tp=tp)


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


@contextlib.contextmanager
def guarded_training(ckpt_dir: Optional[str], get_state, get_step):
    """Save an emergency checkpoint if training dies mid-run, then re-raise
    (the TPU-side equivalent of the reference's destroy_process_group
    try/except, decoder/scripts/train.py:40-45,192-195)."""
    try:
        yield
    except KeyboardInterrupt:
        raise
    except Exception:
        traceback.print_exc()
        if ckpt_dir is not None:
            try:
                from usdm_tpu.core.checkpoint import save_train_state

                state = get_state()
                step = int(get_step())
                print(f"[guarded_training] saving emergency checkpoint at step {step}")
                save_train_state(ckpt_dir, state, step)
            except Exception:  # noqa: BLE001
                traceback.print_exc()
        raise
