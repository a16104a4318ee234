"""GPT-2: logit parity vs HF transformers (random weights, offline), KV-cache
decode consistency, prefix handling, CE-ignore loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.config import GPTConfig
from frankenstein_tpu.models import gpt2
from frankenstein_tpu.models.gpt2_import import params_from_hf_model


def small_cfg():
    return GPTConfig(block_size=64, vocab_size=96, n_layer=2, n_head=2,
                     n_embd=32, dropout=0.0, bias=True)


@pytest.fixture(scope="module")
def hf_pair():
    """Randomly-initialized HF GPT-2 + imported params (no network)."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel
    c = small_cfg()
    hf_cfg = GPT2Config(vocab_size=c.vocab_size, n_positions=c.block_size,
                        n_embd=c.n_embd, n_layer=c.n_layer, n_head=c.n_head,
                        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    params, cfg = params_from_hf_model(hf)
    return hf, params, cfg


def test_logit_parity_with_hf(hf_pair):
    import torch
    hf, params, cfg = hf_pair
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, cfg.vocab_size, size=(2, 10))

    with torch.no_grad():
        ref = hf(torch.tensor(idx)).logits.numpy()

    # our eval forward returns last-position logits; use targets to get all
    targets = np.full_like(idx, 1)
    _, ours = model.apply(params, jnp.asarray(idx), targets=jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_loss_matches_manual_ce(hf_pair):
    _, params, cfg = hf_pair
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, cfg.vocab_size, size=(2, 8))
    targets = idx.copy()
    targets[:, 5:] = -100

    loss, logits = model.apply(params, jnp.asarray(idx), targets=jnp.asarray(targets))
    logits = np.asarray(logits, np.float64)
    # manual shifted CE over non-ignored positions
    tot, n = 0.0, 0
    for b in range(2):
        for t in range(7):
            gt = targets[b, t + 1]
            if gt == -100:
                continue
            z = logits[b, t]
            tot += np.log(np.exp(z - z.max()).sum()) + z.max() - z[gt]
            n += 1
    np.testing.assert_allclose(float(loss), tot / n, rtol=1e-5)


def test_prefix_shifts_positions(hf_pair):
    """Prefix vectors occupy the first wpe positions; text logits must differ
    from the no-prefix case, and loss must remain finite."""
    _, params, cfg = hf_pair
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)))
    prefix = jnp.asarray(rng.standard_normal((1, 4, cfg.n_embd)), jnp.float32)
    targets = idx

    loss_p, logits_p = model.apply(params, idx, prefix=prefix, targets=targets)
    loss_n, logits_n = model.apply(params, idx, targets=targets)
    assert np.isfinite(float(loss_p))
    assert logits_p.shape == logits_n.shape  # text positions only
    assert not np.allclose(np.asarray(logits_p), np.asarray(logits_n))


def test_cached_decode_matches_full_forward(hf_pair):
    """Greedy decode via KV cache must equal greedy decode via full
    re-forward (the reference's O(T^2) scheme)."""
    _, params, cfg = hf_pair
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(3)
    b = 2
    idx0 = rng.integers(0, cfg.vocab_size, size=(b, 3))
    prefix = jnp.asarray(rng.standard_normal((b, 4, cfg.n_embd)), jnp.float32)
    steps = 6

    # reference scheme: full re-forward each step
    idx_full = jnp.asarray(idx0)
    for _ in range(steps):
        _, logits = model.apply(params, idx_full, prefix=prefix)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        idx_full = jnp.concatenate([idx_full, nxt[:, None]], axis=1)

    # cached scheme
    cache = gpt2.init_cache(cfg, b, max_len=32)
    logits, cache, length = model.apply(params, jnp.asarray(idx0), prefix, cache,
                                        method=gpt2.GPT.prefill)
    toks = [jnp.argmax(logits, axis=-1)]
    for _ in range(steps - 1):
        logits, cache, length = model.apply(params, toks[-1], cache, length,
                                            method=gpt2.GPT.decode_step)
        toks.append(jnp.argmax(logits, axis=-1))

    cached_seq = np.stack([np.asarray(t) for t in toks], axis=1)
    full_seq = np.asarray(idx_full[:, 3:])
    np.testing.assert_array_equal(cached_seq, full_seq)


@pytest.mark.slow
def test_dropout_active_only_in_training():
    """cfg.dropout is a real knob (the reference wires attn/resid/embd
    dropout through every block, reference:gpt2_model.py:33,66-71): with
    train=True outputs vary across dropout rngs; with train=False (or at
    decode) they are deterministic and match the dropout=0 model exactly."""
    cfg = small_cfg().replace(dropout=0.5)
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 10)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 10)), jnp.int32)
    params = model.init(jax.random.key(0), idx, targets=tgt)

    l1, _ = model.apply(params, idx, targets=tgt, train=True,
                        rngs={"dropout": jax.random.key(1)})
    l2, _ = model.apply(params, idx, targets=tgt, train=True,
                        rngs={"dropout": jax.random.key(2)})
    assert not np.isclose(float(l1), float(l2)), "dropout had no effect"

    # eval path needs no rng and equals the dropout-0 config bit-for-bit
    le, logits_e = model.apply(params, idx, targets=tgt)
    model0 = gpt2.GPT(cfg.replace(dropout=0.0))
    l0, logits_0 = model0.apply(params, idx, targets=tgt)
    np.testing.assert_array_equal(np.asarray(logits_e), np.asarray(logits_0))
    np.testing.assert_allclose(float(le), float(l0))


# ---------------------------------------------------------------------------
# fused single-program decode step (ops/pallas/fused_decode.py)
# ---------------------------------------------------------------------------

def _fused_geometry_cfg(bias=True):
    # fused kernel needs n_embd % 128 == 0
    return GPTConfig(block_size=64, vocab_size=160, n_layer=2, n_head=2,
                     n_embd=128, dropout=0.0, bias=bias)


def _fused_step(params, cfg, token, cache, length):
    """Test-side driver of the fused path (interpret mode runs on CPU):
    embed + fused blocks + ln_f + tied lm_head, restating decode_step."""
    from frankenstein_tpu.ops import norms
    p = params["params"]
    x = p["wte"][token] + jax.lax.dynamic_slice_in_dim(p["wpe"], length, 1)[0]
    x, cache = gpt2._fused_blocks(cfg, p["h"], x, cache, length,
                                  interpret=True)
    x = norms.layer_norm(x, p["ln_f"]["weight"],
                         p["ln_f"].get("bias"), eps=1e-5)
    return x @ p["wte"].T, cache, length + 1


@pytest.mark.parametrize("bias", [True, False])
def test_fused_decode_step_matches_scan(bias):
    """The fused all-layer Pallas decode step must reproduce the scanned
    per-layer path: logits and cache equal over several steps after a real
    prefill (padding rows, masking, own-token logit all exercised)."""
    cfg = _fused_geometry_cfg(bias)
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(0)
    b, t0, s = 8, 4, 16
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t0)), jnp.int32)
    params = model.init(jax.random.key(0), idx0)

    cache = gpt2.init_cache(cfg, b, s)
    logits_ref, cache_ref, length = model.apply(
        params, idx0, None, cache, method=gpt2.GPT.prefill)
    cache_fused, len_fused = cache_ref, length

    tok = jnp.argmax(logits_ref, axis=-1).astype(jnp.int32)
    tok_fused = tok
    for _ in range(3):
        logits_ref, cache_ref, length = model.apply(
            params, tok, cache_ref, length, method=gpt2.GPT.decode_step)
        logits_f, cache_fused, len_fused = _fused_step(
            params, cfg, tok_fused, cache_fused, len_fused)
        np.testing.assert_allclose(np.asarray(logits_f),
                                   np.asarray(logits_ref),
                                   atol=1e-3, rtol=1e-4)
        for a, r in zip(jax.tree_util.tree_leaves(cache_fused),
                        jax.tree_util.tree_leaves(cache_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)
        tok = jnp.argmax(logits_ref, axis=-1).astype(jnp.int32)
        tok_fused = jnp.argmax(logits_f, axis=-1).astype(jnp.int32)


def test_fused_supported_gate():
    from frankenstein_tpu.ops.pallas import fused_decode
    # flagship decode geometry (bf16 cache) must pass the static gate
    assert fused_decode.supported(12, 12, 64, 128, 64, 2, interpret=True)
    # beams at 3x batch still fit via batch chunking
    assert fused_decode.supported(12, 12, 64, 384, 64, 2, interpret=True)
    # ragged seq / tiny embed rejected
    assert not fused_decode.supported(12, 12, 64, 128, 59, 2, interpret=True)
    assert not fused_decode.supported(2, 2, 16, 8, 16, 4, interpret=True)


@pytest.mark.parametrize("w8", [False, True])
@pytest.mark.parametrize("int8kv", [False, True])
def test_pipelined_kernel_bit_identical_to_grid(monkeypatch, w8, int8kv):
    """The manually-double-buffered kernel (_kernel_pipelined) must be
    BIT-IDENTICAL to the Mosaic-pipelined grid kernel in every serving
    mode — they share _chunk_math, so any drift is a DMA-orchestration
    bug (stale slot, unwaited write-back), exactly what this chains
    3 steps across an 8-row tile boundary to catch."""
    from frankenstein_tpu.ops.pallas import fused_decode as fd
    L, B, S, E, H, HD = 3, 16, 16, 128, 2, 64
    rng = np.random.default_rng(0)
    arr = lambda *sh, dt=jnp.float32, sc=0.1: jnp.asarray(
        rng.standard_normal(sh) * sc, dt)
    p = {"ln1_w": arr(L, E) + 1, "ln1_b": arr(L, E),
         "qkv_w": arr(L, E, 3 * E, dt=jnp.bfloat16), "qkv_b": arr(L, 3 * E),
         "proj_w": arr(L, E, E, dt=jnp.bfloat16), "proj_b": arr(L, E),
         "ln2_w": arr(L, E) + 1, "ln2_b": arr(L, E),
         "fc_w": arr(L, E, 4 * E, dt=jnp.bfloat16), "fc_b": arr(L, 4 * E),
         "fc2_w": arr(L, 4 * E, E, dt=jnp.bfloat16), "fc2_b": arr(L, E)}
    if w8:
        p = fd.quantize_weights(p)
    kcf = arr(L, B, S, E, dt=jnp.bfloat16, sc=1.0)
    vcf = arr(L, B, S, E, dt=jnp.bfloat16, sc=1.0)
    if int8kv:
        kc0, ks = fd.quantize_cache_side(kcf)
        vc0, vs = fd.quantize_cache_side(vcf)
    else:
        kc0, vc0, ks, vs = kcf, vcf, None, None

    # lengths 6, 7, 8 cross the 8-row tile boundary mid-chain
    lengths = (6, 7, 8)
    xs_in = [arr(B, E, dt=jnp.bfloat16, sc=1.0 + i)
             for i in range(len(lengths))]

    def chain(flag):
        monkeypatch.setenv("FK_FUSED_PIPE", flag)
        fd.fused_decode_blocks._clear_cache()
        kc, vc = jnp.copy(kc0), jnp.copy(vc0)
        outs = []
        for x, length in zip(xs_in, lengths):
            xo, kc, vc = fd.fused_decode_blocks(
                x, p, kc, vc, jnp.int32(length), ks, vs,
                n_layer=L, n_head=H, head_dim=HD, interpret=True)
            outs.append(xo)
        fd.fused_decode_blocks._clear_cache()
        return outs, kc, vc

    (xs_g, kc_g, vc_g) = chain("0")
    (xs_p, kc_p, vc_p) = chain("1")
    for a, b in zip(xs_g + [kc_g, vc_g], xs_p + [kc_p, vc_p]):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


# ---------------------------------------------------------------------------
# int8 KV cache (models/gpt2.py:QuantCache + fused_decode quantization)
# ---------------------------------------------------------------------------

def test_quantize_cache_roundtrip_exact_for_old_rows():
    """dequantize -> requantize with the same fixed scales is lossless, so
    the non-fused fallback only rounds the NEW row each step."""
    from frankenstein_tpu.ops.pallas import fused_decode
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 128)).astype(np.float32))
    qc, scales = fused_decode.quantize_cache_side(k)
    deq = fused_decode.dequantize_cache_side(qc, scales, jnp.float32)
    again = fused_decode.quantize_with_scales(deq, scales)
    np.testing.assert_array_equal(np.asarray(qc), np.asarray(again))
    # quantization error bounded by half a step per lane
    step = np.asarray(scales)[:, 0, :]                    # [L, E]
    err = np.abs(np.asarray(deq) - np.asarray(k))
    assert (err <= 0.5 * step[:, None, None, :] + 1e-6).all()


def test_fused_decode_int8_matches_dequantized_float_path():
    """The in-kernel dequant (scale folded into q / applied to the V sum)
    must equal running the float kernel on the dequantized cache — isolates
    the MECHANISM from quantization error (f32 compute in interpret mode)."""
    cfg = _fused_geometry_cfg(True)
    from frankenstein_tpu.ops.pallas import fused_decode
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(4)
    b, t0, s = 8, 4, 16
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t0)), jnp.int32)
    params = model.init(jax.random.key(0), idx0)

    cache = gpt2.init_cache(cfg, b, s)
    _, cache, length = model.apply(params, idx0, None, cache,
                                   method=gpt2.GPT.prefill)
    qcache = gpt2.quantize_cache(cache)
    deq_cache = (
        fused_decode.dequantize_cache_side(qcache.k, qcache.k_scale, jnp.float32),
        fused_decode.dequantize_cache_side(qcache.v, qcache.v_scale, jnp.float32),
    )
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    p = params["params"]
    x = p["wte"][tok] + jax.lax.dynamic_slice_in_dim(p["wpe"], length, 1)[0]
    x_q, qcache2 = gpt2._fused_blocks(cfg, p["h"], x, qcache, length,
                                      interpret=True,
                                      compute_dtype=jnp.float32)
    x_f, fcache2 = gpt2._fused_blocks(cfg, p["h"], x, deq_cache, length,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(x_q), np.asarray(x_f),
                               atol=1e-4, rtol=1e-4)
    # the appended row quantizes with the fixed scales
    row = np.asarray(qcache2.k)[:, :, int(length)]
    want = np.asarray(fused_decode.quantize_rows(
        jnp.asarray(np.asarray(fcache2[0])[:, :, int(length)]), qcache.k_scale))
    np.testing.assert_array_equal(row, want)


def test_int8_decode_step_accuracy_and_reorder():
    """Full decode_step with a QuantCache (CPU -> dequant fallback path):
    logits stay close to the float-cache step, and beam reordering gathers
    codes while leaving the scales alone."""
    cfg = _fused_geometry_cfg(True)
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(5)
    b, t0, s = 4, 6, 16
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t0)), jnp.int32)
    params = model.init(jax.random.key(0), idx0)
    cache = gpt2.init_cache(cfg, b, s)
    logits, cache, length = model.apply(params, idx0, None, cache,
                                        method=gpt2.GPT.prefill)
    qcache = gpt2.quantize_cache(cache)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for _ in range(2):
        lf, cache, length_f = model.apply(params, tok, cache, length,
                                          method=gpt2.GPT.decode_step)
        lq, qcache, length = model.apply(params, tok, qcache, length,
                                         method=gpt2.GPT.decode_step)
        assert isinstance(qcache, gpt2.QuantCache)
        scale = float(np.max(np.abs(np.asarray(lf)))) + 1e-6
        drift = float(np.max(np.abs(np.asarray(lq) - np.asarray(lf)))) / scale
        assert drift < 0.05, drift
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    order = jnp.asarray([1, 0, 3, 2], jnp.int32)
    re = gpt2.GPT.reorder_cache(qcache, order)
    np.testing.assert_array_equal(np.asarray(re.k),
                                  np.asarray(qcache.k)[:, np.asarray(order)])
    np.testing.assert_array_equal(np.asarray(re.k_scale),
                                  np.asarray(qcache.k_scale))


def test_generate_int8_kv_close_to_float():
    """sampling.generate(int8_kv=True) greedy tokens match the float-cache
    run on a case with a confident margin (teacher-forced prefix)."""
    from frankenstein_tpu.decode import sampling
    cfg = _fused_geometry_cfg(True)
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(6)
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 5)), jnp.int32)
    params = model.init(jax.random.key(0), idx0)
    out_f = sampling.generate(model, params, idx0, None, jax.random.key(1),
                              max_new_tokens=6, greedy=True)
    out_q = sampling.generate(model, params, idx0, None, jax.random.key(1),
                              max_new_tokens=6, greedy=True, int8_kv=True)
    agree = float(np.mean(np.asarray(out_f) == np.asarray(out_q)))
    assert agree >= 0.75, agree   # random-init logits have thin margins


def test_fused_decode_int8_weights_match_dequantized():
    """w8a16 mechanism: the in-kernel weight dequant (scale applied to the
    f32 dot output) must equal the float kernel run on the dequantized
    weights — exact in f32 interpret mode. Then end-to-end logit drift from
    the rounding itself stays small."""
    cfg = _fused_geometry_cfg(True)
    from frankenstein_tpu.ops.pallas import fused_decode
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(7)
    b, t0, s = 8, 4, 16
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t0)), jnp.int32)
    params = model.init(jax.random.key(0), idx0)
    p = params["params"]

    cache = gpt2.init_cache(cfg, b, s)
    logits_ref, cache, length = model.apply(params, idx0, None, cache,
                                            method=gpt2.GPT.prefill)

    qw = gpt2.quantize_decode_weights(params, jnp.float32)
    deq = dict(qw)
    for key in fused_decode.WEIGHT_KEYS:
        deq[key] = (qw[key].astype(jnp.float32)
                    * qw[key[:-1] + "s"]).astype(jnp.float32)
        del deq[key[:-1] + "s"]

    tok = jnp.argmax(logits_ref, axis=-1).astype(jnp.int32)
    x = p["wte"][tok] + jax.lax.dynamic_slice_in_dim(p["wpe"], length, 1)[0]
    x_q, _ = gpt2._fused_blocks(cfg, p["h"], x, cache, length,
                                interpret=True, compute_dtype=jnp.float32,
                                stacked=qw)
    x_d, _ = gpt2._fused_blocks(cfg, p["h"], x, cache, length,
                                interpret=True, compute_dtype=jnp.float32,
                                stacked=deq)
    np.testing.assert_allclose(np.asarray(x_q), np.asarray(x_d),
                               atol=1e-4, rtol=1e-4)

    # drift vs the unquantized weights bounded (per-channel int8 rounding)
    x_f, _ = gpt2._fused_blocks(cfg, p["h"], x, cache, length,
                                interpret=True, compute_dtype=jnp.float32)
    scale = float(np.max(np.abs(np.asarray(x_f)))) + 1e-6
    drift = float(np.max(np.abs(np.asarray(x_q) - np.asarray(x_f)))) / scale
    assert drift < 0.05, drift


def test_int8_weights_require_fused_path():
    cfg = _fused_geometry_cfg(True)
    model = gpt2.GPT(cfg)
    idx0 = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.key(0), idx0)
    qw = gpt2.quantize_decode_weights(params)
    cache = gpt2.init_cache(cfg, 2, 8)       # b=2 unsupported by the kernel
    with pytest.raises(NotImplementedError):
        model.apply(params, jnp.zeros((2,), jnp.int32), cache, jnp.int32(4),
                    qw, method=gpt2.GPT.decode_step)


# ---------------------------------------------------------------------------
# MoE-MLP GPT (GPTConfig.moe_experts > 0, models/moe.py)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_moe_gpt_forward_and_grads():
    """moe_experts>0 swaps every block's MLP for MoESwiGLU: loss is finite,
    includes the balancing aux, grads flow to expert AND router params, and
    the cached decode path (scanned XLA fallback) still works."""
    cfg = GPTConfig(block_size=32, vocab_size=96, n_layer=2, n_head=2,
                    n_embd=32, moe_experts=4, moe_k=2)
    model = gpt2.GPT(cfg)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 96, (4, 8)), jnp.int32)
    params = model.init(jax.random.key(0), idx, targets=idx)
    h = params["params"]["h"]
    assert "moe" in h and "c_fc" not in h, list(h)
    assert h["moe"]["w1"].shape == (2, 4, 32, 128)   # [L, E, D, H]

    def loss_fn(p):
        loss, _ = model.apply(p, idx, targets=idx)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = grads["params"]["h"]["moe"]
    assert all(np.isfinite(np.asarray(x)).all() and
               np.abs(np.asarray(x)).sum() > 0
               for x in (g["w1"], g["w2"], g["wg"]))

    # aux loss really contributes: zero-weight config changes the loss
    model0 = gpt2.GPT(cfg.replace(moe_aux_weight=0.0))
    l0 = float(model0.apply(params, idx, targets=idx)[0])
    assert float(loss) > l0, (float(loss), l0)

    # cached decode takes the scanned fallback (fused kernel gated off)
    cache = gpt2.init_cache(cfg, 4, 16)
    logits, cache, length = model.apply(params, idx, None, cache,
                                        method=gpt2.GPT.prefill)
    logits2, _, _ = model.apply(params, jnp.argmax(logits, -1).astype(
        jnp.int32), cache, length, method=gpt2.GPT.decode_step)
    assert np.isfinite(np.asarray(logits2)).all()
