"""Multi-device sharding tests (8 virtual CPU devices).

The reference's TP story is latent inside vLLM and unused (SURVEY.md §2.3);
here tensor parallelism is first-class: parameters are NamedSharding'd over
the ('data','model') mesh and XLA partitions the same jitted programs —
generate/prefill/decode included — with collectives over ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.core.mesh import create_mesh, logical_to_sharding
from usdm_tpu.engine.generate import generate
from usdm_tpu.models import mistral as M

CFG = MistralConfig.tiny(vocab_size=128)


@pytest.fixture(scope="module")
def params():
    return M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")


def _shard(params, mesh):
    shardings = logical_to_sharding(mesh, M.param_specs(CFG))
    return jax.device_put(params, shardings)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_generate_matches_single_device(params, tp, rng):
    prompt = rng.integers(3, CFG.vocab_size, size=(1, 12)).astype(np.int32)
    lens = jnp.asarray([12], jnp.int32)
    allow = jnp.ones(CFG.vocab_size, bool)
    eos = jnp.asarray(2, jnp.int32)

    with jax.default_matmul_precision("highest"):
        t1, l1 = generate(params, CFG, jnp.asarray(prompt), lens, allow, eos,
                          max_new_tokens=8, attn_impl="xla")

        mesh = create_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
        sharded = _shard(params, mesh)
        t2, l2 = generate(sharded, CFG, jnp.asarray(prompt), lens, allow, eos,
                          max_new_tokens=8, attn_impl="xla")
    assert int(l1[0]) == int(l2[0])
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_tp_forward_matches(params, rng):
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(M.forward(params, CFG, ids, attn_impl="xla"))
        mesh = create_mesh(dp=2, tp=4)
        sharded = _shard(params, mesh)
        got = np.asarray(M.forward(sharded, CFG, ids, attn_impl="xla"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_param_specs_cover_all_leaves(params):
    specs = M.param_specs(CFG)
    assert jax.tree.structure(specs) == jax.tree.structure(params)
    # big matrices are sharded on at least one axis
    flat_p, _ = jax.tree.flatten_with_path(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    for (path, leaf), spec in zip(flat_p, flat_s):
        if leaf.ndim >= 2 and min(leaf.shape[-2:]) >= 64:
            assert any(ax is not None for ax in spec), f"unsharded big leaf {path}"
