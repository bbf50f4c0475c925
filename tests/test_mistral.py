"""Mistral LLM golden tests against HF transformers (torch CPU oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.models import mistral as M

CFG = MistralConfig.tiny(vocab_size=128)


def _hf_model(cfg: MistralConfig):
    from transformers import MistralConfig as HFConfig
    from transformers.models.mistral.modeling_mistral import MistralForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_seq_len,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        sliding_window=cfg.sliding_window,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def models():
    hf = _hf_model(CFG)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = M.convert_hf_state_dict(state, CFG, dtype="float32")
    return hf, params


def test_forward_matches_hf(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 24))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(M.forward(params, CFG, jnp.asarray(ids), attn_impl="xla"))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_sliding_window_masks_distant_tokens(models):
    _, params = models
    cfg = CFG.replace(sliding_window=8)
    rng = np.random.default_rng(1)
    t = 32
    ids = rng.integers(0, cfg.vocab_size, size=(1, t))
    base = np.asarray(M.forward(params, cfg, jnp.asarray(ids), attn_impl="xla"))
    # perturbing a token far outside the window must not change late logits
    ids2 = ids.copy()
    ids2[0, 0] = (ids2[0, 0] + 1) % cfg.vocab_size
    pert = np.asarray(M.forward(params, cfg, jnp.asarray(ids2), attn_impl="xla"))
    # last position attends only to the final 9 tokens (w=8)
    np.testing.assert_allclose(base[0, -1], pert[0, -1], rtol=1e-5, atol=1e-5)
    # but an in-window perturbation does change it
    ids3 = ids.copy()
    ids3[0, -2] = (ids3[0, -2] + 1) % cfg.vocab_size
    pert3 = np.asarray(M.forward(params, cfg, jnp.asarray(ids3), attn_impl="xla"))
    assert np.abs(base[0, -1] - pert3[0, -1]).max() > 1e-4


def test_packed_segments_match_separate_forward(models):
    """Packing isolation: two samples in one row with segment ids + restarted
    positions must reproduce the separate per-sample logits (the contract of
    reference cu_seqlens packing, model.py:475-497)."""
    _, params = models
    rng = np.random.default_rng(2)
    a = rng.integers(0, CFG.vocab_size, size=16)
    b = rng.integers(0, CFG.vocab_size, size=12)
    with jax.default_matmul_precision("highest"):
        la = np.asarray(M.forward(params, CFG, jnp.asarray(a[None]), attn_impl="xla"))
        lb = np.asarray(M.forward(params, CFG, jnp.asarray(b[None]), attn_impl="xla"))

        packed = np.concatenate([a, b])[None]
        seg = np.concatenate([np.zeros(16, np.int32), np.ones(12, np.int32)])[None]
        pos = np.concatenate([np.arange(16), np.arange(12)])[None]
        lp = np.asarray(
            M.forward(params, CFG, jnp.asarray(packed), jnp.asarray(seg), jnp.asarray(pos), attn_impl="xla")
        )
    np.testing.assert_allclose(lp[0, :16], la[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(lp[0, 16:], lb[0], rtol=2e-4, atol=2e-4)


def test_prefill_decode_matches_full_forward(models):
    """Greedy decode via prefill+decode_step must equal argmax of the full
    forward at each position."""
    _, params = models
    rng = np.random.default_rng(3)
    prompt_len = 10
    n_steps = 5
    ids = rng.integers(0, CFG.vocab_size, size=(1, prompt_len))

    decode = jax.jit(lambda tok, cache: M.decode_step(params, CFG, tok, cache))
    with jax.default_matmul_precision("highest"):
        cache = M.KVCache.create(CFG, batch=1, max_len=64, dtype="float32")
        logits, cache = M.prefill(params, CFG, jnp.asarray(ids), jnp.asarray([prompt_len]), cache, attn_impl="xla")
        toks = [int(jnp.argmax(logits[0]))]
        for _ in range(n_steps - 1):
            logits, cache = decode(jnp.asarray([toks[-1]]), cache)
            toks.append(int(jnp.argmax(logits[0])))

        # oracle: ONE teacher-forced full forward over prompt + generated
        # tokens; greedy stepwise decode must equal per-position argmax.
        seq = np.concatenate([ids[0], np.asarray(toks[:-1])])[None]
        full = M.forward(params, CFG, jnp.asarray(seq), attn_impl="xla")
        ref = np.argmax(np.asarray(full[0, prompt_len - 1 :]), axis=-1).tolist()
    assert toks == ref


def test_prefill_respects_right_padding(models):
    """Padded prompt positions must not affect the last-token logits."""
    _, params = models
    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 8))
    with jax.default_matmul_precision("highest"):
        cache = M.KVCache.create(CFG, batch=1, max_len=32, dtype="float32")
        l1, _ = M.prefill(params, CFG, jnp.asarray(ids), jnp.asarray([8]), cache, attn_impl="xla")
        padded = np.concatenate([ids, rng.integers(0, CFG.vocab_size, size=(1, 4))], axis=1)
        cache2 = M.KVCache.create(CFG, batch=1, max_len=32, dtype="float32")
        l2, _ = M.prefill(params, CFG, jnp.asarray(padded), jnp.asarray([8]), cache2, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_loss_matches_torch_ce(models):
    hf, params = models
    rng = np.random.default_rng(5)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 16))
    labels = ids.copy()
    labels[0, :4] = -100
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))
        sl = out.logits[:, :-1].reshape(-1, CFG.vocab_size)
        tl = torch.from_numpy(labels)[:, 1:].reshape(-1)
        ref = torch.nn.functional.cross_entropy(sl, tl, ignore_index=-100).item()
    with jax.default_matmul_precision("highest"):
        loss, aux = M.loss_fn(params, CFG, jnp.asarray(ids), jnp.asarray(labels), attn_impl="xla", remat=False)
    assert abs(float(loss) - ref) < 2e-4


def test_chunked_ce_matches_unchunked(models):
    """The seq-chunked cross-entropy (lm_head projected per ce_chunk tokens
    under jax.checkpoint, so [T, vocab] logits never materialize) must be
    numerically identical to the unchunked loss — value AND gradients,
    including a chunk-size that doesn't divide T-1 (pad path)."""
    _, params = models
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 23)), jnp.int32)
    labels = np.asarray(rng.integers(0, CFG.vocab_size, size=(2, 23)), np.int32)
    labels[0, :6] = -100
    labels[1, 15:] = -100
    labels = jnp.asarray(labels)
    with jax.default_matmul_precision("highest"):
        l0, a0 = M.loss_fn(params, CFG, ids, labels, attn_impl="xla",
                           remat=False, ce_chunk=0)
        l1, a1 = M.loss_fn(params, CFG, ids, labels, attn_impl="xla",
                           remat=False, ce_chunk=8)  # 22 tokens -> pad to 24
        g0 = jax.grad(lambda p: M.loss_fn(p, CFG, ids, labels, attn_impl="xla",
                                          remat=False, ce_chunk=0)[0])(params)
        g1 = jax.grad(lambda p: M.loss_fn(p, CFG, ids, labels, attn_impl="xla",
                                          remat=False, ce_chunk=8)[0])(params)
    assert int(a0["ntokens"]) == int(a1["ntokens"])
    assert abs(float(l0) - float(l1)) < 1e-5
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_extend_embeddings():
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key, dtype="float32")
    new_v = CFG.vocab_size + 10
    ext = M.extend_embeddings(params, CFG, new_v, key)
    assert ext["embed"].shape == (new_v, CFG.hidden_size)
    assert ext["lm_head"].shape == (CFG.hidden_size, new_v)
    np.testing.assert_array_equal(np.asarray(ext["embed"][: CFG.vocab_size]), np.asarray(params["embed"]))
