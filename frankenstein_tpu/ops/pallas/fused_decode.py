"""Fused single-token GPT decode step: all transformer layers in ONE Pallas
program.

The unfused decode step (models/gpt2.py:178-188, an ``nn.scan`` over 12
blocks) is ~6x off its HBM roofline at batch 128: every layer's op chain
(LN, qkv matmul, cache update, masked softmax, proj, MLP) round-trips
activations through HBM and pays XLA per-op overheads 12 times per token.
A decode step moves ~470 MB (weights 170 MB + KV cache 300 MB) and does only
~25 GFLOP — pure bandwidth — so the win is one kernel that streams each
layer's weights and cache exactly once while the [B, E] activation stays
resident in VMEM.

Structure (grid = (n_layer, batch_chunks), batch axis fastest so each
layer's weights are fetched ONCE and revisited across batch chunks):
- weights arrive as the stacked [L, ...] arrays ``nn.scan`` already stores
  (models/gpt2.py:114-120) — the BlockSpec index map streams layer l's slice;
- the KV caches ([L, B, S, H*D] view) stream one (layer, batch-chunk) block
  per step; attention against them is per-head VPU multiply-reduce (a
  batched GEMV has no dense MXU mapping — each batch row owns a different K,
  and Mosaic's 1-batch-dim tpu.matmul would loop 1-row MXU passes);
- the current token's K/V are computed in-kernel, written to ``k_new/v_new``
  outputs, and folded into the softmax as an extra logit (the cache read is
  one step stale by design); the caller scatters the rows into the cache
  with one ``dynamic_update_slice`` (in-place inside a scan carry);
- ``length`` rides scalar prefetch and masks cache rows ``j >= length``;
- the full [B, E] activation lives in an f32 VMEM scratch across the whole
  grid; batch chunking bounds the attention temporaries (Mosaic allocates
  unrolled per-head temps without stack reuse, so bc=128 blows scoped vmem).

The reference has no cached decode at all — it re-forwards the entire
sequence per token (reference:models/gpt2_model.py:328-353).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float(np.finfo(np.float32).min)
VMEM_LIMIT = 114 * 1024 * 1024      # raised via CompilerParams below
_HEADROOM = 0.88                    # leave slack for Mosaic-internal buffers


def _layer_norm_f32(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic has
    no erf primitive, and the tanh-approx GELU would drift from the exact
    GELU the unfused path (models/gpt2.py:96) computes."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # erf formulation (reference:gpt2_model.py uses torch's exact gelu)
    return 0.5 * x * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


def _chunk_math(x, length, w, kc, vc, *, n_head: int, head_dim: int,
                seq: int, quant_cache: bool, quant_w: bool, compute_dtype):
    """One layer's math for one batch chunk — shared VERBATIM by the
    Mosaic-pipelined kernel (``_kernel``) and the manually-double-buffered
    one (``_kernel_pipelined``) so their outputs are bit-identical.

    x: [BC, E] f32 residual; length: scalar int32; kc/vc: [BC, S, E]
    cache-dtype arrays; w: dict of this layer's arrays — vectors [1, D],
    matrices [in, out], plus ks/vs [1, E] (quant_cache) and sqkv/sproj/
    sfc/sfc2 [1, D] (quant_w). Returns (x' [BC, E] f32, row_k, row_v
    [BC, E] in the cache dtype).
    """
    scale = 1.0 / np.sqrt(head_dim)
    cdt = compute_dtype
    e = n_head * head_dim

    # ---- attention sublayer -------------------------------------------
    h = _layer_norm_f32(x, w["ln1w"].astype(jnp.float32),
                        w["ln1b"].astype(jnp.float32))
    qkv = jax.lax.dot_general(h.astype(cdt), w["wqkv"].astype(cdt),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if quant_w:
        qkv = qkv * w["sqkv"]
    qkv = qkv + w["bqkv"].astype(jnp.float32)
    q, k_new, v_new = qkv[:, :e], qkv[:, e:2 * e], qkv[:, 2 * e:]
    if quant_cache:
        q8 = lambda r, s: jnp.clip(jnp.round(r / s), -127, 127
                                   ).astype(jnp.int8)
        row_k, row_v = q8(k_new, w["ks"]), q8(v_new, w["vs"])
    else:
        row_k = k_new.astype(kc.dtype)
        row_v = v_new.astype(vc.dtype)

    bc_, _, e_ = kc.shape
    lane_head = (jax.lax.broadcasted_iota(jnp.int32, (e, n_head), 0)
                 // head_dim)
    seg_sum = (lane_head ==
               jax.lax.broadcasted_iota(jnp.int32, (e, n_head), 1)
               ).astype(jnp.float32)                  # [E, H]
    expand = seg_sum.T                                # [H, E]

    q_k = q * w["ks"] if quant_cache else q
    prod = q_k.astype(cdt)[:, None, :] * kc.astype(cdt)   # [BC, S, E]
    s = jax.lax.dot_general(prod.reshape(bc_ * seq, e_),
                            seg_sum.astype(cdt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s.reshape(bc_, seq, n_head) * scale           # [BC, S, H]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, seq, 1), 1)
             < length)
    s = jnp.where(valid, s, NEG_INF)
    s_own = jax.lax.dot_general(q * k_new, seg_sum, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    m = jnp.maximum(jnp.max(s, axis=1), s_own)        # [BC, H]
    p = jnp.exp(s - m[:, None, :])
    p_own = jnp.exp(s_own - m)
    denom = jnp.sum(p, axis=1) + p_own                # [BC, H]
    p = p / denom[:, None, :]
    p_wide = jax.lax.dot_general(p.reshape(bc_ * seq, n_head).astype(cdt),
                                 expand.astype(cdt),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(cdt)
    o = jnp.sum((p_wide.reshape(bc_, seq, e_)
                 * vc.astype(cdt)).astype(jnp.float32), axis=1)  # [BC, E] f32
    if quant_cache:
        o = o * w["vs"]
    own_wide = jax.lax.dot_general(p_own / denom, expand,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    o = o + own_wide * v_new
    y = jax.lax.dot_general(o.astype(cdt), w["wproj"].astype(cdt),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if quant_w:
        y = y * w["sproj"]
    x = x + y + w["bproj"].astype(jnp.float32)

    # ---- MLP sublayer --------------------------------------------------
    h2 = _layer_norm_f32(x, w["ln2w"].astype(jnp.float32),
                         w["ln2b"].astype(jnp.float32))
    hh = jax.lax.dot_general(h2.astype(cdt), w["wfc"].astype(cdt),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if quant_w:
        hh = hh * w["sfc"]
    hh = _gelu_exact(hh + w["bfc"].astype(jnp.float32))
    y2 = jax.lax.dot_general(hh.astype(cdt), w["wfc2"].astype(cdt),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if quant_w:
        y2 = y2 * w["sfc2"]
    x = x + y2 + w["bfc2"].astype(jnp.float32)
    return x, row_k, row_v


def _kernel(len_ref, x_ref, ln1w, ln1b, wqkv, bqkv, wproj, bproj,
            ln2w, ln2b, wfc, bfc, wfc2, bfc2, kc_ref, vc_ref, *rest,
            n_layer: int, n_head: int, head_dim: int, seq: int, bc: int,
            quant_cache: bool, quant_w: bool, compute_dtype):
    # Optional dequant-scale inputs appear ONLY in the quantized modes —
    # the float path keeps its original op and DMA count (Mosaic cannot
    # constant-fold runtime ones-arrays, so they must not be passed at all).
    i = 0
    if quant_cache:
        ks_ref, vs_ref = rest[i], rest[i + 1]
        i += 2
    if quant_w:
        sqkv, sproj, sfc, sfc2 = rest[i:i + 4]
        i += 4
    xout_ref, knew_ref, vnew_ref, x_scr = rest[i:i + 4]
    l = pl.program_id(0)
    bi = pl.program_id(1)
    rows = pl.ds(bi * bc, bc)

    @pl.when(l == 0)
    def _load():
        x_scr[rows] = x_ref[...].astype(jnp.float32)

    x = x_scr[rows]                                   # [BC, E] f32
    # Weight matrices may arrive int8 (w8a16 serving mode): _chunk_math
    # converts in-register for the bf16 MXU dot, then applies the
    # per-(layer, out-lane) dequant scale to the f32 dot output — exact for
    # symmetric per-channel quantization (y_j = s_j * sum_i x_i w8_ij).
    # For float weights the .astype is a no-op and the scale multiplies are
    # compiled out entirely (quant_w is a static flag; scale operands are
    # never even passed). int8 KV caches dequantize in-register via the
    # per-(layer, lane) scales, and the new rows REQUANTIZE in-kernel
    # before the int8 store.
    w = {"ln1w": ln1w[0], "ln1b": ln1b[0], "wqkv": wqkv[0],
         "bqkv": bqkv[0], "wproj": wproj[0], "bproj": bproj[0],
         "ln2w": ln2w[0], "ln2b": ln2b[0], "wfc": wfc[0], "bfc": bfc[0],
         "wfc2": wfc2[0], "bfc2": bfc2[0]}
    if quant_cache:
        w["ks"], w["vs"] = ks_ref[0], vs_ref[0]
    if quant_w:
        w["sqkv"], w["sproj"] = sqkv[0], sproj[0]
        w["sfc"], w["sfc2"] = sfc[0], sfc2[0]
    # Attention runs for ALL heads at once at full 768-lane VPU width — a
    # per-head loop works on 64-lane slices (half the VPU idle) and Mosaic
    # allocates its unrolled temporaries without stack reuse. Per-head
    # reductions and broadcasts ride tiny MXU dots against 0/1 segment
    # matrices instead of [BC, S, H, D] reshapes (whose (12, 64) minor
    # tiles pad 2.7x). See _chunk_math.
    x, row_k, row_v = _chunk_math(
        x, len_ref[0], w, kc_ref[0], vc_ref[0], n_head=n_head,
        head_dim=head_dim, seq=seq, quant_cache=quant_cache,
        quant_w=quant_w, compute_dtype=compute_dtype)

    # The new rows write STRAIGHT INTO the caches: knew_ref/vnew_ref are
    # [1, BC, 8, E] blocks of the cache outputs around row ``length``
    # (scalar-prefetch output index map; Mosaic needs the second-minor
    # block dim divisible by 8, so the updated row is blended into its
    # 8-row tile from the already-loaded cache block) and the cache outputs
    # ALIAS the inputs. The XLA alternative — return rows, then
    # dynamic_update_slice — is in-place for the cache but pays two
    # layout-retiling copies of the [L, B, 1, E] rows per step (~0.2 ms
    # each at b=128, HLO cost model + tools/chain_attr.py).
    base = (len_ref[0] // 8) * 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
           == (len_ref[0] - base))
    ktile = kc_ref[0, :, pl.ds(base, 8)]    # dynamic ref slice (VMEM)
    vtile = vc_ref[0, :, pl.ds(base, 8)]
    knew_ref[0] = jnp.where(sel, row_k[:, None, :], ktile)
    vnew_ref[0] = jnp.where(sel, row_v[:, None, :], vtile)

    x_scr[rows] = x

    @pl.when(l == n_layer - 1)
    def _store():
        xout_ref[...] = x.astype(xout_ref.dtype)


def _vmem_estimate(bc: int, s: int, e: int, n_head: int, hd: int, b: int,
                   cache_itemsize: int) -> int:
    """``cache_itemsize`` sizes ONLY the streamed cache blocks (int8 KV
    halves those); weights and the in-kernel temporaries are in the compute
    dtype (bf16, 2 bytes) regardless — sizing them with the cache itemsize
    would understate true VMEM ~40% for int8 caches and admit geometries
    that then fail Mosaic compilation instead of falling back."""
    compute = max(cache_itemsize, 2)
    weights = (e * 3 * e + e * e + 2 * e * 4 * e + 8 * e) * compute
    caches = 2 * bc * s * e * cache_itemsize
    # ~3 live [BC, S, E] compute-dtype temporaries (QK product, expanded
    # probs, AV product) + one f32 (AV accumulate) + qkv/mlp activations —
    # Mosaic's stack allocator does not aggressively reuse slots
    stack = bc * s * e * (3 * compute + 4) + 12 * bc * e * 4
    return 2 * (weights + caches) + stack + b * e * 4


def _pick_batch_chunk(b: int, s: int, e: int, n_head: int, hd: int,
                      cache_itemsize: int) -> int:
    """Largest batch chunk (divides b) whose double-buffered blocks plus
    in-kernel temporaries fit the raised VMEM limit."""
    for bc in (128, 64, 32, 16, 8):
        if b % bc != 0:
            continue
        if _vmem_estimate(bc, s, e, n_head, hd, b, cache_itemsize) < (
                VMEM_LIMIT * _HEADROOM):
            return bc
    return 0


def supported(n_layer: int, n_head: int, head_dim: int, b: int, s: int,
              itemsize: int = 2, interpret: bool = False) -> bool:
    """Static gate; the caller falls back to the scanned XLA path."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    e = n_head * head_dim
    if s % 8 != 0 or b % 8 != 0 or e % 128 != 0:
        return False
    return _pick_batch_chunk(b, s, e, n_head, head_dim, itemsize) > 0


# ---------------------------------------------------------------------------
# int8 KV-cache quantization (symmetric, per (layer, lane) = per (layer,
# head, dim) channel — finer than per-head, and the dequant scale applies as
# one [E]-lane vector multiply in the kernel)
# ---------------------------------------------------------------------------


def quantize_cache_side(cache):
    """[L, B, S, E] float -> (int8 codes, f32 scales [L, 1, E]).

    Scales are absmax/127 over (batch, position) at quantization time
    (prefill); later decode steps reuse them and CLIP — fine in practice
    since per-step activations share the prefill's dynamic range, and
    accuracy is property-tested in tests/test_gpt2.py."""
    c = cache.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(c), axis=(1, 2))               # [L, E]
    scales = (jnp.maximum(absmax, 1e-6) / 127.0)[:, None, :]  # [L, 1, E]
    codes = jnp.clip(jnp.round(c / scales[:, :, None, :]), -127, 127)
    return codes.astype(jnp.int8), scales


def quantize_rows(rows, scales):
    """New K/V rows [L, B, E] -> int8 with the cache's FIXED scales."""
    q = jnp.round(rows.astype(jnp.float32) / scales)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quantize_with_scales(cache, scales):
    """Full cache [L, B, S, E] -> int8 with FIXED scales [L, 1, E].

    Values that came from ``dequantize_cache_side`` round-trip exactly
    (code * scale / scale rounds back to code), so the non-fused fallback's
    dequantize -> run -> requantize cycle only rounds the NEW row."""
    q = jnp.round(cache.astype(jnp.float32) / scales[:, :, None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequantize_cache_side(codes, scales, dtype):
    """Inverse of quantize_cache_side (for the non-fused fallback path)."""
    return (codes.astype(jnp.float32) * scales[:, :, None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# Manually-pipelined variant: the grid kernel above leaves compute and DMA
# nearly SERIALIZED (measured r4: gutting the attention math saved its full
# ~0.10 ms/token and bf16->int8 weights saved exactly their bytes at ~100%
# marginal bandwidth — so neither the VPU attention nor the MXU dots hide
# under the streams; per-grid-step overhead is ~1 us and the aliased
# write-back ~0.03 ms, neither explains the ~0.19 ms/token gap to the HBM
# floor). This kernel owns the streams instead: ONE program (no grid),
# weights and caches arrive as HBM (ANY) refs, and a fori_loop over
# (layer, batch-chunk) steps double-buffers every stream with explicit
# pltpu.make_async_copy — chunk (l, bi+1) and the next layer's weights
# stream WHILE (l, bi) computes, and the 8-row cache write-backs drain
# asynchronously two steps behind. The math is _chunk_math — bit-identical
# to the grid kernel by construction.
# ---------------------------------------------------------------------------


_CSLOTS = 3     # cache-chunk buffering depth (lookahead _CSLOTS - 1)


def _kernel_pipelined(len_ref, x_ref, ln1w, ln1b, bqkv, bproj, ln2w, ln2b,
                      bfc, bfc2, wqkv_h, wproj_h, wfc_h, wfc2_h,
                      kc_h, vc_h, *rest,
                      n_layer: int, n_head: int, head_dim: int, seq: int,
                      bc: int, nc: int, quant_cache: bool, quant_w: bool,
                      compute_dtype):
    i = 0
    if quant_cache:
        ks_ref, vs_ref = rest[i], rest[i + 1]          # [L, 1, E] f32
        i += 2
    if quant_w:
        sqkv, sproj, sfc, sfc2 = rest[i:i + 4]         # [L, 1, D] f32
        i += 4
    (xout_ref, kco_h, vco_h,
     wq_s, wp_s, wf_s, wf2_s, kc_s, vc_s, kt_s, vt_s, x_scr,
     wsem, csem, tsem) = rest[i:i + 15]
    from jax.experimental.pallas import tpu as pltpu

    nsteps = n_layer * nc
    length = len_ref[0]
    base = (length // 8) * 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
           == (length - base))

    def wcopies(l, lslot):
        return [
            pltpu.make_async_copy(wqkv_h.at[l], wq_s.at[lslot],
                                  wsem.at[lslot, 0]),
            pltpu.make_async_copy(wproj_h.at[l], wp_s.at[lslot],
                                  wsem.at[lslot, 1]),
            pltpu.make_async_copy(wfc_h.at[l], wf_s.at[lslot],
                                  wsem.at[lslot, 2]),
            pltpu.make_async_copy(wfc2_h.at[l], wf2_s.at[lslot],
                                  wsem.at[lslot, 3]),
        ]

    def ccopies(l, bi, slot):
        rows = pl.ds(bi * bc, bc)
        return [
            pltpu.make_async_copy(kc_h.at[l, rows], kc_s.at[slot],
                                  csem.at[slot, 0]),
            pltpu.make_async_copy(vc_h.at[l, rows], vc_s.at[slot],
                                  csem.at[slot, 1]),
        ]

    def chunk_for(step):
        """Start the (k, v) chunk DMAs for a flat step (traced int32)."""
        ln = step // nc
        for c in ccopies(ln, step - ln * nc, jax.lax.rem(step, _CSLOTS)):
            c.start()

    def tcopies(l, bi, slot):
        rows = pl.ds(bi * bc, bc)
        tile = pl.ds(base, 8)
        return [
            pltpu.make_async_copy(kt_s.at[slot], kco_h.at[l, rows, tile],
                                  tsem.at[slot, 0]),
            pltpu.make_async_copy(vt_s.at[slot], vco_h.at[l, rows, tile],
                                  tsem.at[slot, 1]),
        ]

    for c in wcopies(0, 0):                             # warm-up
        c.start()
    for j in range(min(_CSLOTS - 1, nsteps)):           # chunk lookahead
        for c in ccopies(j // nc, j % nc, j % _CSLOTS):
            c.start()

    def body(i, _):
        l = i // nc
        bi = i - l * nc
        slot = jax.lax.rem(i, _CSLOTS)
        tslot = jax.lax.rem(i, 2)
        lslot = jax.lax.rem(l, 2)
        nxt = i + (_CSLOTS - 1)

        @pl.when(nxt < nsteps)
        def _start_next():
            chunk_for(nxt)

        @pl.when(bi == 0)
        def _wait_weights():
            for c in wcopies(l, lslot):
                c.wait()
            # prefetch NEXT layer's weights a full layer ahead — the slot
            # being overwritten held layer l-1's, whose compute is done
            @pl.when(l + 1 < n_layer)
            def _start_weights():
                for c in wcopies(l + 1, jax.lax.rem(l + 1, 2)):
                    c.start()

        for c in ccopies(l, bi, slot):
            c.wait()

        # the tile scratch slot is reused every 2 steps: drain the
        # write-back issued at step i-2 before overwriting it
        @pl.when(i >= 2)
        def _wait_tiles():
            l2 = (i - 2) // nc
            for c in tcopies(l2, (i - 2) - l2 * nc, tslot):
                c.wait()

        rows = pl.ds(bi * bc, bc)

        @pl.when(l == 0)
        def _load():
            x_scr[rows] = x_ref[rows].astype(jnp.float32)

        x = x_scr[rows]
        # vector params ride as [L, 1, D]: the leading dim is untiled, so
        # the dynamic layer index needs no sublane-alignment proof (a
        # [L, D] layout would put l on the 8-sublane axis — Mosaic rejects
        # the dynamic slice at trace-dependent l)
        w = {"ln1w": ln1w[l], "ln1b": ln1b[l], "wqkv": wq_s[lslot],
             "bqkv": bqkv[l], "wproj": wp_s[lslot], "bproj": bproj[l],
             "ln2w": ln2w[l], "ln2b": ln2b[l], "wfc": wf_s[lslot],
             "bfc": bfc[l], "wfc2": wf2_s[lslot], "bfc2": bfc2[l]}
        if quant_cache:
            w["ks"], w["vs"] = ks_ref[l], vs_ref[l]
        if quant_w:
            w["sqkv"], w["sproj"] = sqkv[l], sproj[l]
            w["sfc"], w["sfc2"] = sfc[l], sfc2[l]
        x, row_k, row_v = _chunk_math(
            x, length, w, kc_s[slot], vc_s[slot], n_head=n_head,
            head_dim=head_dim, seq=seq, quant_cache=quant_cache,
            quant_w=quant_w, compute_dtype=compute_dtype)

        kt_s[tslot] = jnp.where(sel, row_k[:, None, :],
                                kc_s[slot, :, pl.ds(base, 8)])
        vt_s[tslot] = jnp.where(sel, row_v[:, None, :],
                                vc_s[slot, :, pl.ds(base, 8)])
        for c in tcopies(l, bi, tslot):
            c.start()

        x_scr[rows] = x

        @pl.when(l == n_layer - 1)
        def _store():
            xout_ref[rows] = x.astype(xout_ref.dtype)

        return _

    jax.lax.fori_loop(0, nsteps, body, None)
    for j in range(max(0, nsteps - 2), nsteps):         # drain write-backs
        for c in tcopies(j // nc, j % nc, j % 2):
            c.wait()


def _vmem_estimate_pipelined(bc: int, s: int, e: int, b: int,
                             cache_itemsize: int, w_itemsize: int) -> int:
    compute = max(cache_itemsize, 2)
    weights = 2 * 12 * e * e * w_itemsize               # 2 slots x 4 mats
    caches = _CSLOTS * 2 * bc * s * e * cache_itemsize  # slots x (k, v)
    tiles = 2 * 2 * bc * 8 * e * cache_itemsize
    vecs = 32 * e * 4                                   # 13e params + scales
    stack = bc * s * e * (3 * compute + 4) + 12 * bc * e * 4
    return weights + caches + tiles + vecs + stack + 2 * b * e * 4


def _pick_batch_chunk_pipelined(b: int, s: int, e: int, cache_itemsize: int,
                                w_itemsize: int) -> int:
    for bc in (128, 64, 32, 16, 8):
        if b % bc != 0:
            continue
        if _vmem_estimate_pipelined(bc, s, e, b, cache_itemsize,
                                    w_itemsize) < (VMEM_LIMIT * _HEADROOM):
            return bc
    return 0


def _fused_decode_pipelined(x, stacked, k_cache, v_cache, length,
                            k_scale, v_scale, *, n_layer: int, n_head: int,
                            head_dim: int, bc: int, quant_cache: bool,
                            quant_w: bool, compute_dtype, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b, e = x.shape
    s = k_cache.shape[2]
    nc = b // bc
    p = stacked
    wdt = p["qkv_w"].dtype
    cdt_cache = k_cache.dtype
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    v3 = lambda a: a[:, None, :]                  # [L, D] -> [L, 1, D]
    operands = [jnp.reshape(length, (1,)).astype(jnp.int32), x,
                v3(p["ln1_w"]), v3(p["ln1_b"]), v3(p["qkv_b"]),
                v3(p["proj_b"]), v3(p["ln2_w"]), v3(p["ln2_b"]),
                v3(p["fc_b"]), v3(p["fc2_b"]),
                p["qkv_w"], p["proj_w"], p["fc_w"], p["fc2_w"],
                k_cache, v_cache]
    in_specs = [smem, vmem] + [vmem] * 8 + [any_spec] * 4 + [any_spec] * 2
    if quant_cache:
        operands += [k_scale.reshape(n_layer, 1, e),
                     v_scale.reshape(n_layer, 1, e)]
        in_specs += [vmem, vmem]
    if quant_w:
        operands += [p["qkv_s"].reshape(n_layer, 1, 3 * e),
                     p["proj_s"].reshape(n_layer, 1, e),
                     p["fc_s"].reshape(n_layer, 1, 4 * e),
                     p["fc2_s"].reshape(n_layer, 1, e)]
        in_specs += [vmem] * 4

    xo, kc_out, vc_out = pl.pallas_call(
        functools.partial(_kernel_pipelined, n_layer=n_layer, n_head=n_head,
                          head_dim=head_dim, seq=s, bc=bc, nc=nc,
                          quant_cache=quant_cache, quant_w=quant_w,
                          compute_dtype=compute_dtype),
        in_specs=in_specs,
        out_specs=[vmem, any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, e), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, 3 * e), wdt),
            pltpu.VMEM((2, e, e), wdt),
            pltpu.VMEM((2, e, 4 * e), wdt),
            pltpu.VMEM((2, 4 * e, e), wdt),
            pltpu.VMEM((_CSLOTS, bc, s, e), cdt_cache),
            pltpu.VMEM((_CSLOTS, bc, s, e), cdt_cache),
            pltpu.VMEM((2, bc, 8, e), cdt_cache),
            pltpu.VMEM((2, bc, 8, e), cdt_cache),
            pltpu.VMEM((b, e), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((_CSLOTS, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={14: 1, 15: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)
    return xo, kc_out, vc_out


WEIGHT_KEYS = ("qkv_w", "proj_w", "fc_w", "fc2_w")


def quantize_weights(stacked):
    """w8a16 serving mode: int8 matrices + per-(layer, out-lane) scales.

    Symmetric per-output-channel quantization — the dequant scale applies
    EXACTLY after the dot (y_j = s_j * sum_i x_i w8_ij), so the kernel's MXU
    dot runs on converted int8 codes and the only approximation is the
    0.4%-granular rounding of the weights themselves. Returns a copy of
    ``stacked`` with each ``*_w`` [L, in, out] replaced by int8 codes and a
    matching ``*_s`` [L, 1, out] f32 added. Quantize ONCE per decode
    dispatch (outside the token scan)."""
    out = dict(stacked)
    for key in WEIGHT_KEYS:
        w = stacked[key].astype(jnp.float32)                  # [L, in, out]
        absmax = jnp.max(jnp.abs(w), axis=1)                  # [L, out]
        s = (jnp.maximum(absmax, 1e-8) / 127.0)[:, None, :]   # [L, 1, out]
        out[key] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out[key[:-1] + "s"] = s
    return out


@functools.partial(jax.jit, static_argnames=("n_layer", "n_head", "head_dim",
                                             "interpret"))
def fused_decode_blocks(x, stacked, k_cache, v_cache, length,
                        k_scale=None, v_scale=None, *,
                        n_layer: int, n_head: int, head_dim: int,
                        interpret: bool = False):
    """Run all transformer blocks for ONE token position.

    x: [B, E] embedded token (wte+wpe); stacked: dict of [L, ...] params with
    keys ln1_w ln1_b qkv_w qkv_b proj_w proj_b ln2_w ln2_b fc_w fc_b fc2_w
    fc2_b (kernels in [in, out] layout); k_cache/v_cache: [L, B, S, E];
    length: [] int32 count of valid cache rows.

    int8 KV cache: pass int8 caches plus per-(layer, lane) dequant scales
    k_scale/v_scale [L, 1, E] f32 (see ``quantize_cache``); rows dequantize
    in-register, halving the dominant cache HBM stream (measured 0.14 ->
    0.10 ms for the per-step K read at the flagship shape on v5e); the new
    rows REQUANTIZE in-kernel with the same fixed scales (same round/clip
    as ``quantize_rows``).

    Returns (x_out [B, E], k_cache', v_cache') — the caches are updated IN
    PLACE (the outputs alias the inputs; the kernel writes the new rows at
    row ``length`` directly). The caller must treat the INPUT cache arrays
    as consumed and carry the returned ones. The XLA alternative (return
    rows + dynamic_update_slice) pays two layout-retiling row copies per
    step, ~0.4 ms at b=128 (tools/chain_attr.py, HLO cost model).
    """
    from jax.experimental.pallas import tpu as pltpu

    b, e = x.shape
    s = k_cache.shape[2]
    w8 = stacked["qkv_w"].dtype == jnp.int8       # w8a16 weights
    if w8:
        # compute dtype: the float cache's dtype (the returned k_new/v_new
        # rows scatter straight into it); bf16 when the cache is int8 too
        cdt = k_cache.dtype if k_cache.dtype != jnp.int8 else jnp.bfloat16
    else:
        cdt = stacked["qkv_w"].dtype              # compute dtype
    quant_cache = k_cache.dtype == jnp.int8
    if quant_cache:
        assert k_scale is not None and v_scale is not None
        cache_scales = (k_scale, v_scale)
    else:
        cache_scales = ()
    w_scales = ((stacked["qkv_s"], stacked["proj_s"],
                 stacked["fc_s"], stacked["fc2_s"]) if w8 else ())
    # FK_FUSED_PIPE=0 reverts to the Mosaic-auto-pipelined grid kernel.
    # The manual kernel (default) owns the streams — weights/caches as HBM
    # refs, 3-slot chunk buffering, layer-ahead weight prefetch — and is
    # bit-identical (shared _chunk_math; TPU-verified both serving modes).
    # Measured r4 at the flagship decode shape (b=128, s=64): w8a16
    # 0.655 -> 0.485 ms/token (1.35x, ~100% HBM bw incl. write-backs),
    # bf16 0.749 -> 0.643 (1.16x, bc falls 64 -> 32 for VMEM). Read at
    # TRACE time — the first decode dispatch bakes the value into the jit
    # cache; set it before the first decode.
    import os
    if os.environ.get("FK_FUSED_PIPE", "1") == "1":
        bcp = _pick_batch_chunk_pipelined(
            b, s, e, jnp.dtype(k_cache.dtype).itemsize,
            jnp.dtype(stacked["qkv_w"].dtype).itemsize)
        if bcp > 0 and n_layer * (b // bcp) >= 2:
            return _fused_decode_pipelined(
                x, stacked, k_cache, v_cache, length, k_scale, v_scale,
                n_layer=n_layer, n_head=n_head, head_dim=head_dim, bc=bcp,
                quant_cache=quant_cache, quant_w=w8, compute_dtype=cdt,
                interpret=interpret)

    v3 = lambda a: a[:, None, :]                  # [L, D] -> [L, 1, D]
    bc = _pick_batch_chunk(b, s, e, n_head, head_dim,
                           jnp.dtype(k_cache.dtype).itemsize)
    assert bc > 0, "caller must gate on supported()"
    grid = (n_layer, b // bc)

    # [L, D] vectors ride as [L, 1, D] — Mosaic needs the second-minor block
    # dim to divide 8 or equal the array dim
    mat = lambda d1, d2: pl.BlockSpec((1, d1, d2),
                                      lambda l, bi, len_r: (l, 0, 0))
    vec = lambda d: pl.BlockSpec((1, 1, d), lambda l, bi, len_r: (l, 0, 0))
    in_specs = [
        pl.BlockSpec((bc, e), lambda l, bi, len_r: (bi, 0)),          # x
        vec(e), vec(e),                                               # ln1
        mat(e, 3 * e), vec(3 * e),                                    # qkv
        mat(e, e), vec(e),                                            # proj
        vec(e), vec(e),                                               # ln2
        mat(e, 4 * e), vec(4 * e),                                    # fc
        mat(4 * e, e), vec(e),                                        # fc2
        pl.BlockSpec((1, bc, s, e), lambda l, bi, len_r: (l, bi, 0, 0)),
        pl.BlockSpec((1, bc, s, e), lambda l, bi, len_r: (l, bi, 0, 0)),
    ]
    if quant_cache:
        in_specs += [vec(e), vec(e)]                                  # ks, vs
    if w8:
        in_specs += [vec(3 * e), vec(e), vec(4 * e), vec(e)]          # w scales
    out_specs = [
        pl.BlockSpec((bc, e), lambda l, bi, len_r: (bi, 0)),          # x_out
        # new K/V rows land in the 8-row tile around row ``length`` of the
        # ALIASED caches: the output block index rides the scalar prefetch,
        # so each grid step writes exactly its (layer, batch-chunk) tile
        pl.BlockSpec((1, bc, 8, e),
                     lambda l, bi, len_r: (l, bi, len_r[0] // 8, 0)),
        pl.BlockSpec((1, bc, 8, e),
                     lambda l, bi, len_r: (l, bi, len_r[0] // 8, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((b, e), jnp.float32)],
    )
    p = stacked
    # the cache outputs ALIAS the cache inputs (operands 14/15 of the call,
    # counting the scalar prefetch at 0) — the kernel scatters the new rows
    # in place and the caller gets back the SAME buffers, updated. In-kernel
    # quantization (int8 caches) keeps the rows in the cache dtype.
    xo, kc_out, vc_out = pl.pallas_call(
        functools.partial(_kernel, n_layer=n_layer, n_head=n_head,
                          head_dim=head_dim, seq=s, bc=bc,
                          quant_cache=quant_cache, quant_w=w8,
                          compute_dtype=cdt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, e), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={14: 1, 15: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.reshape(length, (1,)).astype(jnp.int32),
      x,
      v3(p["ln1_w"]), v3(p["ln1_b"]), p["qkv_w"], v3(p["qkv_b"]),
      p["proj_w"], v3(p["proj_b"]), v3(p["ln2_w"]), v3(p["ln2_b"]),
      p["fc_w"], v3(p["fc_b"]), p["fc2_w"], v3(p["fc2_b"]),
      k_cache, v_cache, *cache_scales, *w_scales)
    return xo, kc_out, vc_out
