"""Fused single-token LLaMA decode step: all transformer layers in ONE
Pallas program.

The LLaMA twin of ops/pallas/fused_decode.py (see that module's docstring
for the architecture rationale — the unfused scanned step round-trips
activations through HBM and pays per-op overheads once per layer on a step
that is pure bandwidth). Differences from the GPT kernel:

- RMSNorm (no mean subtraction, no bias) instead of LayerNorm;
- rotary position embedding applied IN-KERNEL to the new q/k row: the
  caller passes the folded [1, E] cos/sin table rows for position
  ``length`` and the kernel rotates with the pltpu.roll pair-swap idiom
  proven in ops/pallas/block_attention.py:_rot_rows (interleaved-pair
  convention, matching ops/rope.py); the k row rotates at kv width with
  the first E_kv lanes of the same tables (folded tables tile per head,
  so the slice IS the kv-width table);
- GQA: the cache stores the kv heads UNEXPANDED ([L, B, S, E_kv], the
  models/llama.py:init_llama_cache convention since round 5 — at 16q/8kv
  that is HALF the cache bytes and half the per-step cache stream of the
  r4 pre-expanded layout, and the stream is what breaks decode scaling:
  0.639 -> 0.852 ms/token from b=32 -> b=128 on the expanded cache,
  BASELINE.md round 4). Attention expands per use WITHOUT materializing
  an [BC, S, E] copy: q heads are processed in ``rfac = H/KV`` slot
  groups — slot r gathers q lanes of heads ``h ≡ r (mod rfac)`` down to
  kv width with a 0/1 selection matrix (a [BC, E] x [E, E_kv] dot — BC
  rows, negligible), runs the score/softmax/AV chain entirely at kv
  width against the unexpanded cache, and scatters its [BC, E_kv]
  output back to the q lanes with the transposed selection. Per-slot
  softmaxes are independent (different q heads), so the math is exactly
  the expanded computation re-associated; total elementwise/dot FLOPs
  match the old expanded kernel while the cache stream halves;
- SwiGLU MLP (three matmuls, silu gate) instead of GELU;
- w8a16 serving mode (``quantize_weights``: int8 matrices, per-(layer,
  out-lane) scales dequantized exactly after each dot) mirrors the GPT
  kernel's; it matters MORE here — at the ~110M rescorer shape, b=32, the
  7 weight matrices are ~73% of the step's HBM bytes (vs ~34% for GPT-2
  at b=128), so halving the weight stream attacks the dominant term;
- int8 KV cache (round 5): same contract as fused_decode.py — int8 codes
  with per-(layer, lane) scales [L, 1, E_kv]; the k scale folds into the
  slot-gathered q before the score dot, the v scale applies to the
  summed AV output, and the new rows REQUANTIZE in-kernel with the fixed
  scales before the aliased 8-row store.

The reference has no LLaMA at all (its README names the stage as intent,
reference:README.md:19) and no cached decode for any model
(reference:models/gpt2_model.py:328-353).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float(np.finfo(np.float32).min)
VMEM_LIMIT = 114 * 1024 * 1024
_HEADROOM = 0.88


def _rms_f32(x, w, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ms + eps) * w.astype(jnp.float32)


def _rot_row(x, cos, sin):
    """Rotate [R, E] lanes with [1, E] folded tables (interleaved pairs:
    out[2i] = x[2i] c_i - x[2i+1] s_i; out[2i+1] = x[2i] s_i + x[2i+1] c_i).
    f32 math, cast back to x.dtype — same rounding point as ops/rope.py."""
    from jax.experimental.pallas import tpu as pltpu
    xf = x.astype(jnp.float32)
    even = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1) % 2) == 0
    lanes = xf.shape[-1]
    xs = jnp.where(even, pltpu.roll(xf, lanes - 1, 1), pltpu.roll(xf, 1, 1))
    sign = jnp.where(even, -1.0, 1.0)
    return (xf * cos.astype(jnp.float32)
            + xs * (sign * sin.astype(jnp.float32))).astype(x.dtype)


def _slot_select(e: int, e_kv: int, head_dim: int, rfac: int, r: int):
    """[E, E_kv] 0/1 selection for GQA slot ``r``: q lane i of head
    h = g*rfac + r maps to kv lane g*head_dim + i%head_dim (the HF
    repeat-interleave convention, kv(h) = h // rfac — the same mapping
    ``replication_matrix`` encodes); rows of other slots are zero. Built
    from iotas so it is a computed constant, not an HBM operand."""
    i = jax.lax.broadcasted_iota(jnp.int32, (e, e_kv), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (e, e_kv), 1)
    h = i // head_dim
    hit = ((h % rfac) == r) & (j == (h // rfac) * head_dim + (i % head_dim))
    return hit.astype(jnp.float32)


def _layer_math(x, length, w, kc, vc, cos, sin, *, n_heads: int,
                head_dim: int, n_kv_heads: int, seq: int, eps: float,
                compute_dtype, cache_dtype, quant_cache: bool = False,
                quant_w: bool = False):
    """One layer's math for one batch chunk — shared VERBATIM by the
    Mosaic-pipelined grid kernel (``_kernel``) and the manually-double-
    buffered one (``_kernel_pipelined``) so their outputs are bit-identical
    (the fused_decode.py:_chunk_math pattern). The big-model kernel
    (``_kernel_bigmodel``) reuses ``_attn_math`` but streams the MLP in
    hidden chunks, so its MLP differs by f32 partial-sum reassociation
    only.

    x: [BC, E] f32 residual; length: scalar int32; kc/vc: [BC, S, E_kv]
    cache-dtype arrays, kv heads UNEXPANDED (stale — the new row folds in
    as an extra logit); w: dict of this layer's arrays — norm1/norm2
    [1, E] (or [E]), matmul kernels [in, out] in the compute dtype (int8
    codes when ``quant_w``, converted in-register, plus per-out-lane
    scales "sq".."sd" [1, out] applied EXACTLY after each f32 dot output —
    symmetric per-channel quantization, the fused_decode.py w8a16
    contract), plus ks/vs [1, E_kv] cache-dequant scales when
    ``quant_cache``; cos/sin [1, E] f32 folded rope rows. Returns
    (x' [BC, E] f32, row_k, row_v [BC, E_kv] in ``cache_dtype``)."""
    x, row_k, row_v = _attn_math(
        x, length, w, kc, vc, cos, sin, n_heads=n_heads, head_dim=head_dim,
        n_kv_heads=n_kv_heads, seq=seq, eps=eps, compute_dtype=compute_dtype,
        cache_dtype=cache_dtype, quant_cache=quant_cache, quant_w=quant_w)
    x = _mlp_math(x, w, eps=eps, compute_dtype=compute_dtype,
                  quant_w=quant_w)
    return x, row_k, row_v


def _attn_math(x, length, w, kc, vc, cos, sin, *, n_heads: int,
               head_dim: int, n_kv_heads: int, seq: int, eps: float,
               compute_dtype, cache_dtype, quant_cache: bool,
               quant_w: bool):
    """Attention sublayer of ``_layer_math`` (see its docstring)."""
    scale = 1.0 / np.sqrt(head_dim)
    cdt = compute_dtype
    e = n_heads * head_dim
    e_kv = n_kv_heads * head_dim
    rfac = n_heads // n_kv_heads
    nkv = n_kv_heads

    h = _rms_f32(x, w["norm1"], eps)
    dot = lambda a, wm: jax.lax.dot_general(
        a.astype(cdt), wm.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q_pre = dot(h, w["wq"])
    k_pre = dot(h, w["wk"])
    v_pre = dot(h, w["wv"])
    if quant_w:
        q_pre = q_pre * w["sq"]
        k_pre = k_pre * w["sk"]
        v_pre = v_pre * w["sv"]
    q = _rot_row(q_pre, cos, sin)                       # [BC, E] f32
    # the new k/v rows stay at kv width; folded tables tile per head, so
    # the first E_kv lanes of the [1, E] tables ARE the kv-width tables
    k_new = _rot_row(k_pre, cos[:, :e_kv], sin[:, :e_kv])   # [BC, E_kv]
    v_new = v_pre                                           # [BC, E_kv]
    if quant_cache:
        q8 = lambda rows, sc: jnp.clip(jnp.round(rows / sc), -127, 127
                                       ).astype(jnp.int8)
        row_k, row_v = q8(k_new, w["ks"]), q8(v_new, w["vs"])
    else:
        row_k = k_new.astype(cache_dtype)
        row_v = v_new.astype(cache_dtype)

    bc_, _, ekv_ = kc.shape
    lane_kv = (jax.lax.broadcasted_iota(jnp.int32, (e_kv, nkv), 0)
               // head_dim)
    seg_kv = (lane_kv ==
              jax.lax.broadcasted_iota(jnp.int32, (e_kv, nkv), 1)
              ).astype(jnp.float32)                     # [E_kv, KV]
    expand_kv = seg_kv.T                                # [KV, E_kv]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, seq, 1), 1)
             < length)

    # per-slot attention at kv width (slot r = q heads h ≡ r mod rfac);
    # softmaxes are per-head so slots are independent — the unrolled loop
    # is the expanded computation re-associated, not an approximation
    o = jnp.zeros((bc_, e), jnp.float32)
    for r in range(rfac):
        if rfac == 1:
            q_r = q
        else:
            sel = _slot_select(e, e_kv, head_dim, rfac, r)
            q_r = jax.lax.dot_general(q, sel, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        q_cache = q_r * w["ks"] if quant_cache else q_r
        prod = q_cache.astype(cdt)[:, None, :] * kc.astype(cdt)
        s = jax.lax.dot_general(prod.reshape(bc_ * seq, ekv_),
                                seg_kv.astype(cdt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s.reshape(bc_, seq, nkv) * scale            # [BC, S, KV]
        s = jnp.where(valid, s, NEG_INF)
        s_own = jax.lax.dot_general(q_r * k_new, seg_kv,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale           # [BC, KV]
        m = jnp.maximum(jnp.max(s, axis=1), s_own)
        p = jnp.exp(s - m[:, None, :])
        p_own = jnp.exp(s_own - m)
        denom = jnp.sum(p, axis=1) + p_own              # [BC, KV]
        p = p / denom[:, None, :]
        p_wide = jax.lax.dot_general(
            p.reshape(bc_ * seq, nkv).astype(cdt), expand_kv.astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        o_kv = jnp.sum((p_wide.reshape(bc_, seq, ekv_)
                        * vc.astype(cdt)).astype(jnp.float32),
                       axis=1)                          # [BC, E_kv] f32
        if quant_cache:
            o_kv = o_kv * w["vs"]
        own_wide = jax.lax.dot_general(p_own / denom, expand_kv,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        o_kv = o_kv + own_wide * v_new
        if rfac == 1:
            o = o + o_kv
        else:
            # scatter kv lanes back to slot r's q lanes (contract with the
            # selection's kv axis — the transposed 0/1 map)
            o = o + jax.lax.dot_general(o_kv, sel, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    y = dot(o, w["wo"])
    if quant_w:
        y = y * w["so"]
    return x + y, row_k, row_v


def _mlp_math(x, w, *, eps: float, compute_dtype, quant_w: bool):
    """SwiGLU MLP sublayer of ``_layer_math`` (see its docstring)."""
    cdt = compute_dtype
    dot = lambda a, wm: jax.lax.dot_general(
        a.astype(cdt), wm.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h2 = _rms_f32(x, w["norm2"], eps)
    g = dot(h2, w["wg"])
    u = dot(h2, w["wu"])
    if quant_w:
        g = g * w["sg"]
        u = u * w["su"]
    act = (g * jax.nn.sigmoid(g) * u).astype(cdt)
    y2 = jax.lax.dot_general(act, w["wd"].astype(cdt),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if quant_w:
        y2 = y2 * w["sd"]
    return x + y2


_SCALE_KEYS = ("sq", "sk", "sv", "so", "sg", "su", "sd")


def _kernel(len_ref, x_ref, cos_ref, sin_ref, norm1, wq, wk, wv, wo,
            norm2, wg, wu, wd, kc_ref, vc_ref, *rest,
            n_layers: int, n_heads: int, head_dim: int, n_kv_heads: int,
            seq: int, bc: int, eps: float, compute_dtype,
            quant_cache: bool, quant_w: bool):
    # optional dequant-scale inputs appear ONLY in their quantized modes —
    # the float path keeps its original op and DMA count (the
    # fused_decode.py convention: Mosaic cannot constant-fold runtime
    # ones-arrays)
    i = 0
    if quant_cache:
        ks_ref, vs_ref = rest[i], rest[i + 1]
        i += 2
    if quant_w:
        scales = rest[i:i + 7]
        i += 7
    xout_ref, knew_ref, vnew_ref, x_scr = rest[i:i + 4]
    l = pl.program_id(0)
    bi = pl.program_id(1)
    rows = pl.ds(bi * bc, bc)

    @pl.when(l == 0)
    def _load():
        x_scr[rows] = x_ref[...].astype(jnp.float32)

    x = x_scr[rows]                                     # [BC, E] f32
    w = {"norm1": norm1[0, 0], "wq": wq[0], "wk": wk[0], "wv": wv[0],
         "wo": wo[0], "norm2": norm2[0, 0], "wg": wg[0], "wu": wu[0],
         "wd": wd[0]}
    if quant_cache:
        w["ks"], w["vs"] = ks_ref[0], vs_ref[0]
    if quant_w:
        for key, ref in zip(_SCALE_KEYS, scales):
            w[key] = ref[0]
    x, row_k, row_v = _layer_math(
        x, len_ref[0], w, kc_ref[0], vc_ref[0], cos_ref[...], sin_ref[...],
        n_heads=n_heads, head_dim=head_dim, n_kv_heads=n_kv_heads, seq=seq,
        eps=eps, compute_dtype=compute_dtype, cache_dtype=knew_ref.dtype,
        quant_cache=quant_cache, quant_w=quant_w)

    # new rows blend into the 8-row cache tile around ``length`` and write
    # STRAIGHT INTO the aliased cache outputs (scalar-prefetch output index
    # map; Mosaic needs the second-minor out-block dim divisible by 8)
    base = (len_ref[0] // 8) * 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
           == (len_ref[0] - base))
    ktile = kc_ref[0, :, pl.ds(base, 8)]
    vtile = vc_ref[0, :, pl.ds(base, 8)]
    knew_ref[0] = jnp.where(sel, row_k[:, None, :], ktile)
    vnew_ref[0] = jnp.where(sel, row_v[:, None, :], vtile)

    x_scr[rows] = x

    @pl.when(l == n_layers - 1)
    def _store():
        xout_ref[...] = x.astype(xout_ref.dtype)


def _vmem_estimate(bc: int, s: int, e: int, e_kv: int, f: int, b: int,
                   itemsize: int, cache_itemsize: int) -> int:
    """``itemsize`` is the compute dtype's width (2 for bf16, 4 for the
    default f32 Llama) — sizing a f32 model at 2 bytes would understate
    true VMEM 2x and admit geometries that then fail Mosaic compilation
    instead of falling back (the fused_decode.py lesson).
    ``cache_itemsize`` sizes only the streamed cache blocks (int8 KV
    halves those)."""
    compute = max(itemsize, 2)
    weights = (2 * e * e + 2 * e * e_kv + 2 * e * f + f * e
               + 2 * e) * compute
    caches = 2 * bc * s * e_kv * cache_itemsize
    # live compute temporaries: per-slot [BC, S, E_kv] products/probs sum
    # to E lanes across the unrolled slot loop (Mosaic's stack allocator
    # does not aggressively reuse slots) + one f32 AV accumulate + the
    # [BC, F] MLP pair + activations
    stack = bc * s * e * (3 * compute + 4) + 4 * bc * f * 4 + 12 * bc * e * 4
    return 2 * (weights + caches) + stack + b * e * 4   # + f32 x scratch


def _pick_batch_chunk(b: int, s: int, e: int, e_kv: int, f: int,
                      itemsize: int = 2, cache_itemsize: int = None) -> int:
    if cache_itemsize is None:
        cache_itemsize = itemsize
    for bc in (128, 64, 32, 16, 8):
        if b % bc != 0:
            continue
        if _vmem_estimate(bc, s, e, e_kv, f, b, itemsize,
                          cache_itemsize) < (VMEM_LIMIT * _HEADROOM):
            return bc
    return 0


def supported(n_heads: int, head_dim: int, n_kv_heads: int, hidden: int,
              b: int, s: int, itemsize: int = 2, cache_itemsize: int = None,
              w_itemsize: int = None, n_layers: int = 0,
              interpret: bool = False) -> bool:
    """Static gate; callers fall back to the scanned XLA path.
    ``cache_itemsize`` defaults to ``itemsize`` (pass 1 for int8 KV);
    ``w_itemsize`` to the compute width (pass 1 for w8a16). When the
    standard per-layer-weights-resident kernels don't fit, geometries the
    big-model chunked-MLP kernel can hold are also accepted — pass
    ``n_layers`` to enable that check (its VMEM budget holds all layers'
    norm/scale vectors)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    e, e_kv = n_heads * head_dim, n_kv_heads * head_dim
    if s % 8 != 0 or b % 8 != 0:
        return False
    if e % 128 != 0 or e_kv % 128 != 0 or hidden % 128 != 0:
        return False
    if head_dim % 2 != 0 or n_heads % n_kv_heads != 0:
        return False
    if _pick_batch_chunk(b, s, e, e_kv, hidden, itemsize,
                         cache_itemsize) > 0:
        return True
    if n_layers > 0:
        wi = w_itemsize if w_itemsize is not None else max(itemsize, 2)
        ci = cache_itemsize if cache_itemsize is not None else itemsize
        return _pick_bigmodel_chunks(b, s, e, e_kv, hidden, n_layers,
                                     itemsize, wi, ci) > 0
    return False


# ---------------------------------------------------------------------------
# Manually-pipelined variant (the fused_decode.py:_kernel_pipelined pattern):
# the grid kernel above leaves compute and DMA nearly serialized — at the
# ~110M rescorer shape the 7 weight matrices (~186 MB/step bf16) dominate
# the streams at small batch, so overlapping them under the VPU attention
# and MXU dots is worth more here than it was for GPT-2. ONE program (no
# grid): weights and caches arrive as HBM (ANY) refs and a fori_loop over
# (layer, batch-chunk) steps double-buffers every stream with explicit
# pltpu.make_async_copy — chunk (l, bi+1) and the next layer's weights
# stream WHILE (l, bi) computes, and the 8-row cache write-backs drain
# asynchronously two steps behind. The math is _layer_math — bit-identical
# to the grid kernel by construction.
# ---------------------------------------------------------------------------


_CSLOTS = 3     # cache-chunk buffering depth (lookahead _CSLOTS - 1)


def _kernel_pipelined(len_ref, x_ref, cos_ref, sin_ref,
                      norm1, norm2, wq_h, wk_h, wv_h, wo_h, wg_h, wu_h, wd_h,
                      kc_h, vc_h, *rest,
                      n_layers: int, n_heads: int, head_dim: int,
                      n_kv_heads: int, seq: int, bc: int, nc: int,
                      eps: float, compute_dtype, quant_cache: bool,
                      quant_w: bool):
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    if quant_cache:
        ks_ref, vs_ref = rest[i], rest[i + 1]           # [L, 1, E_kv] f32
        i += 2
    if quant_w:
        scale_refs = rest[i:i + 7]                      # [L, 1, out] f32
        i += 7
    (xout_ref, kco_h, vco_h,
     wq_s, wk_s, wv_s, wo_s, wg_s, wu_s, wd_s,
     kc_s, vc_s, kt_s, vt_s, x_scr, wsem, csem, tsem) = rest[i:i + 18]

    nsteps = n_layers * nc
    length = len_ref[0]
    base = (length // 8) * 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
           == (length - base))
    cos = cos_ref[...]
    sin = sin_ref[...]

    wmats = ((wq_h, wq_s), (wk_h, wk_s), (wv_h, wv_s), (wo_h, wo_s),
             (wg_h, wg_s), (wu_h, wu_s), (wd_h, wd_s))

    def wcopies(l, lslot):
        return [pltpu.make_async_copy(h.at[l], s.at[lslot], wsem.at[lslot, j])
                for j, (h, s) in enumerate(wmats)]

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
            @pl.when(l + 1 < n_layers)
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
        # norm vectors ride as [L, 1, E]: the leading dim is untiled, so
        # the dynamic layer index needs no sublane-alignment proof
        w = {"norm1": norm1[l], "wq": wq_s[lslot], "wk": wk_s[lslot],
             "wv": wv_s[lslot], "wo": wo_s[lslot], "norm2": norm2[l],
             "wg": wg_s[lslot], "wu": wu_s[lslot], "wd": wd_s[lslot]}
        if quant_cache:
            w["ks"], w["vs"] = ks_ref[l], vs_ref[l]
        if quant_w:
            for key, ref in zip(_SCALE_KEYS, scale_refs):
                w[key] = ref[l]
        x, row_k, row_v = _layer_math(
            x, length, w, kc_s[slot], vc_s[slot], cos, sin,
            n_heads=n_heads, head_dim=head_dim, n_kv_heads=n_kv_heads,
            seq=seq, eps=eps, compute_dtype=compute_dtype,
            cache_dtype=kt_s.dtype, quant_cache=quant_cache,
            quant_w=quant_w)

        kt_s[tslot] = jnp.where(sel, row_k[:, None, :],
                                kc_s[slot, :, pl.ds(base, 8)])
        vt_s[tslot] = jnp.where(sel, row_v[:, None, :],
                                vc_s[slot, :, pl.ds(base, 8)])
        for c in tcopies(l, bi, tslot):
            c.start()

        x_scr[rows] = x

        @pl.when(l == n_layers - 1)
        def _store():
            xout_ref[rows] = x.astype(xout_ref.dtype)

        return _

    jax.lax.fori_loop(0, nsteps, body, None)
    for j in range(max(0, nsteps - 2), nsteps):         # drain write-backs
        for c in tcopies(j // nc, j % nc, j % 2):
            c.wait()


def _vmem_estimate_pipelined(bc: int, s: int, e: int, e_kv: int, f: int,
                             b: int, itemsize: int, w_itemsize: int,
                             cache_itemsize: int) -> int:
    """``w_itemsize`` sizes the double-buffered weight slots (int8 halves
    them in the w8a16 mode), ``cache_itemsize`` the cache chunk slots (int8
    KV); the compute temporaries stay at the compute width."""
    compute = max(itemsize, 2)
    weights = 2 * (2 * e * e + 2 * e * e_kv + 3 * e * f) * w_itemsize
    caches = _CSLOTS * 2 * bc * s * e_kv * cache_itemsize   # slots x (k, v)
    tiles = 2 * 2 * bc * 8 * e_kv * cache_itemsize
    consts = 2 * e * 4 + 4 * e * 4                      # rope rows, norms
    stack = bc * s * e * (3 * compute + 4) + 4 * bc * f * 4 + 12 * bc * e * 4
    return weights + caches + tiles + consts + stack + 2 * b * e * 4


def _pick_batch_chunk_pipelined(b: int, s: int, e: int, e_kv: int, f: int,
                                itemsize: int, w_itemsize: int = None,
                                cache_itemsize: int = None) -> int:
    if w_itemsize is None:
        w_itemsize = max(itemsize, 2)
    if cache_itemsize is None:
        cache_itemsize = max(itemsize, 2)
    for bc in (128, 64, 32, 16, 8):
        if b % bc != 0:
            continue
        if _vmem_estimate_pipelined(bc, s, e, e_kv, f, b, itemsize,
                                    w_itemsize, cache_itemsize) < (
                VMEM_LIMIT * _HEADROOM):
            return bc
    return 0


# ---------------------------------------------------------------------------
# Big-model variant: one layer's weights no longer fit VMEM double-buffered
# (a ~1B-class LLaMA layer is ~45M weights — ~90 MB bf16 against a ~100 MB
# usable VMEM budget), so the grid and pipelined kernels above gate
# themselves out and decode falls back to the scanned XLA path, which has
# no w8a16 route at all. This kernel streams the MLP weights in ``hc``
# hidden-chunks (wg/wu [E, F/hc], wd [F/hc, E] slices, double-buffered with
# explicit async copies) while the attention weights — much smaller —
# double-buffer per layer as usual. The MLP hidden contraction splits into
# exact per-chunk partial sums accumulated in f32 (w8a16 out-lane scales
# apply after the full sum), so outputs differ from the unchunked kernels
# by f32 reassociation only. Restriction: the whole batch runs as ONE
# chunk (nc == 1) — at big-model geometries VMEM math caps the batch at
# ~32 anyway, and re-streaming chunked weights per batch chunk would
# multiply the dominant stream.
# ---------------------------------------------------------------------------


def _kernel_bigmodel(len_ref, x_ref, cos_ref, sin_ref, norm1, norm2,
                     wq_h, wk_h, wv_h, wo_h, wg_h, wu_h, wd_h,
                     kc_h, vc_h, *rest,
                     n_layers: int, n_heads: int, head_dim: int,
                     n_kv_heads: int, seq: int, hc: int, eps: float,
                     compute_dtype, quant_cache: bool, quant_w: bool):
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    if quant_cache:
        ks_ref, vs_ref = rest[i], rest[i + 1]           # [L, 1, E_kv] f32
        i += 2
    if quant_w:
        scale_refs = rest[i:i + 7]                      # [L, 1, out] f32
        i += 7
    (xout_ref, kco_h, vco_h,
     wq_s, wk_s, wv_s, wo_s, mg_s, mu_s, md_s,
     kc_s, vc_s, kt_s, vt_s, x_scr, wsem, msem, csem, tsem) = rest[i:i + 19]

    f = wg_h.shape[2]
    fc = f // hc
    length = len_ref[0]
    base = (length // 8) * 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
           == (length - base))
    cos = cos_ref[...]
    sin = sin_ref[...]

    awmats = ((wq_h, wq_s), (wk_h, wk_s), (wv_h, wv_s), (wo_h, wo_s))

    def wcopies(l, lslot):
        return [pltpu.make_async_copy(h.at[l], s.at[lslot], wsem.at[lslot, j])
                for j, (h, s) in enumerate(awmats)]

    def mcopies(l, c, mslot):
        cols = pl.ds(c * fc, fc)
        return [
            pltpu.make_async_copy(wg_h.at[l, :, cols], mg_s.at[mslot],
                                  msem.at[mslot, 0]),
            pltpu.make_async_copy(wu_h.at[l, :, cols], mu_s.at[mslot],
                                  msem.at[mslot, 1]),
            pltpu.make_async_copy(wd_h.at[l, cols, :], md_s.at[mslot],
                                  msem.at[mslot, 2]),
        ]

    def ccopies(l, slot):
        return [
            pltpu.make_async_copy(kc_h.at[l], kc_s.at[slot],
                                  csem.at[slot, 0]),
            pltpu.make_async_copy(vc_h.at[l], vc_s.at[slot],
                                  csem.at[slot, 1]),
        ]

    def tcopies(l, slot):
        tile = pl.ds(base, 8)
        return [
            pltpu.make_async_copy(kt_s.at[slot], kco_h.at[l, :, tile],
                                  tsem.at[slot, 0]),
            pltpu.make_async_copy(vt_s.at[slot], vco_h.at[l, :, tile],
                                  tsem.at[slot, 1]),
        ]

    for c in wcopies(0, 0):                             # warm-up
        c.start()
    for c in mcopies(0, 0, 0):
        c.start()
    for j in range(min(_CSLOTS - 1, n_layers)):         # cache lookahead
        for c in ccopies(j, j % _CSLOTS):
            c.start()

    def body(l, _):
        slot = jax.lax.rem(l, _CSLOTS)
        tslot = jax.lax.rem(l, 2)
        lslot = jax.lax.rem(l, 2)
        nxt = l + (_CSLOTS - 1)

        @pl.when(nxt < n_layers)
        def _start_next_cache():
            for c in ccopies(nxt, jax.lax.rem(nxt, _CSLOTS)):
                c.start()

        for c in wcopies(l, lslot):
            c.wait()
        for c in ccopies(l, slot):
            c.wait()

        @pl.when(l >= 2)
        def _wait_tiles():
            for c in tcopies(l - 2, tslot):
                c.wait()

        @pl.when(l == 0)
        def _load():
            x_scr[...] = x_ref[...].astype(jnp.float32)

        x = x_scr[...]
        w = {"norm1": norm1[l], "norm2": norm2[l],
             "wq": wq_s[lslot], "wk": wk_s[lslot], "wv": wv_s[lslot],
             "wo": wo_s[lslot]}
        if quant_cache:
            w["ks"], w["vs"] = ks_ref[l], vs_ref[l]
        if quant_w:
            for key, ref in zip(_SCALE_KEYS, scale_refs):
                if key in ("sq", "sk", "sv", "so"):
                    w[key] = ref[l]
        x, row_k, row_v = _attn_math(
            x, length, w, kc_s[slot], vc_s[slot], cos, sin,
            n_heads=n_heads, head_dim=head_dim, n_kv_heads=n_kv_heads,
            seq=seq, eps=eps, compute_dtype=compute_dtype,
            cache_dtype=kt_s.dtype, quant_cache=quant_cache,
            quant_w=quant_w)

        kt_s[tslot] = jnp.where(sel, row_k[:, None, :],
                                kc_s[slot, :, pl.ds(base, 8)])
        vt_s[tslot] = jnp.where(sel, row_v[:, None, :],
                                vc_s[slot, :, pl.ds(base, 8)])
        for c in tcopies(l, tslot):
            c.start()

        # attention weights for l+1 stream UNDER the MLP compute
        @pl.when(l + 1 < n_layers)
        def _start_attn_weights():
            for c in wcopies(l + 1, jax.lax.rem(l + 1, 2)):
                c.start()

        # ---- chunked SwiGLU MLP (static unroll over hidden chunks) ----
        # Slot parity is GLOBAL over (layer, chunk): chunk c of layer l
        # lives in slot (l*hc + c) % 2, so the cross-layer prefetch (last
        # chunk of l starts chunk 0 of l+1) and l+1's wait agree for odd
        # hc too — with the per-layer c % 2 convention an odd hc put the
        # prefetch in slot 1 while the next layer waited slot 0: a
        # semaphore deadlock the TPU watchdog reports as a worker crash
        # (found by tools/llama_scale_probe.py at 1B w8a16, where the
        # int8 weights fit hc=1; interpret-mode copies are synchronous
        # and cannot catch it).
        cdt = compute_dtype
        h2 = _rms_f32(x, norm2[l], eps)
        dotf = lambda a, wm: jax.lax.dot_general(
            a.astype(cdt), wm.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = jnp.zeros_like(x)
        sg = scale_refs[4] if quant_w else None
        su = scale_refs[5] if quant_w else None
        pb = jax.lax.rem(l * hc, 2)
        for c in range(hc):
            mslot = jax.lax.rem(pb + c, 2)
            for cp in mcopies(l, c, mslot):
                cp.wait()
            if c + 1 < hc:
                for cp in mcopies(l, c + 1, jax.lax.rem(pb + c + 1, 2)):
                    cp.start()
            else:
                @pl.when(l + 1 < n_layers)
                def _start_next_mlp():
                    for cp in mcopies(l + 1, 0, jax.lax.rem(pb + hc, 2)):
                        cp.start()
            g = dotf(h2, mg_s[mslot])
            u = dotf(h2, mu_s[mslot])
            if quant_w:
                cols = pl.ds(c * fc, fc)
                g = g * sg[l, :, cols]
                u = u * su[l, :, cols]
            act = (g * jax.nn.sigmoid(g) * u).astype(cdt)
            y2 = y2 + dotf(act, md_s[mslot])
        if quant_w:
            y2 = y2 * scale_refs[6][l]                  # sd: [1, E]
        x = x + y2

        x_scr[...] = x

        @pl.when(l == n_layers - 1)
        def _store():
            xout_ref[...] = x.astype(xout_ref.dtype)

        return _

    jax.lax.fori_loop(0, n_layers, body, None)
    for j in range(max(0, n_layers - 2), n_layers):     # drain write-backs
        for c in tcopies(j, j % 2):
            c.wait()


def _vmem_estimate_bigmodel(b: int, s: int, e: int, e_kv: int, f: int,
                            hc: int, n_layers: int, itemsize: int,
                            w_itemsize: int, cache_itemsize: int) -> int:
    compute = max(itemsize, 2)
    fc = f // hc
    attn_w = 2 * (2 * e * e + 2 * e * e_kv) * w_itemsize
    mlp_w = 2 * 3 * e * fc * w_itemsize
    caches = _CSLOTS * 2 * b * s * e_kv * cache_itemsize
    tiles = 2 * 2 * b * 8 * e_kv * cache_itemsize
    norms = 2 * n_layers * e * 4 + 2 * e * 4
    scales = n_layers * (3 * e + 2 * e_kv + 2 * f) * 4   # w8a16 worst case
    stack = b * s * e * (3 * compute + 4) + 4 * b * fc * 4 + 12 * b * e * 4
    # w8a16 scratch holds int8 codes, but every MXU dot first materializes a
    # bf16 CONVERTED copy of its weight operand on Mosaic's stack — ~2 such
    # converts live at once. Omitting this admitted a dim-2560/ff-6912 shape
    # at hc=2 that Mosaic then scoped-vmem-OOMed by 3.1 MiB (measured
    # 2026-08-21: actual 117.1 MiB vs an 96.6 MiB estimate; the ~21 MiB gap
    # ~= one live [e, fc] bf16 convert). Calibrated so the TPU-validated
    # 0.82B w8a16 shape keeps its measured hc=2 while the 2560/6912 shape
    # moves to hc=6, whose smaller mlp scratch + converts fit.
    converts = (2 * e * max(e, fc) * compute if w_itemsize < compute else 0)
    return (attn_w + mlp_w + caches + tiles + norms + scales + stack
            + converts + 2 * b * e * 4)


def _pick_bigmodel_chunks(b: int, s: int, e: int, e_kv: int, f: int,
                          n_layers: int, itemsize: int, w_itemsize: int,
                          cache_itemsize: int) -> int:
    """Smallest hidden-chunk count hc (1 <= hc, f/hc % 128 == 0) whose VMEM
    estimate fits; 0 if none does. nc == 1 (whole batch as one chunk)."""
    if b % 8 != 0:
        return 0
    hc = 1
    while hc <= 64:
        if f % hc == 0 and (f // hc) % 128 == 0:
            if _vmem_estimate_bigmodel(b, s, e, e_kv, f, hc, n_layers,
                                       itemsize, w_itemsize,
                                       cache_itemsize) < (
                    VMEM_LIMIT * _HEADROOM):
                return hc
        hc += 1
    return 0


def _fused_llama_decode_bigmodel(x, stacked, k_cache, v_cache, length,
                                 cos_row, sin_row, k_scale, v_scale, *,
                                 n_layers: int, n_heads: int, head_dim: int,
                                 n_kv_heads: int, hidden: int, eps: float,
                                 hc: int, compute_dtype, quant_cache: bool,
                                 quant_w: bool, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b, e = x.shape
    s = k_cache.shape[2]
    e_kv = n_kv_heads * head_dim
    fc = hidden // hc
    p = stacked
    cdt = compute_dtype
    wdt = p["wq"].dtype
    cache_dt = k_cache.dtype
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    v3 = lambda a: a[:, None, :]

    operands = [jnp.reshape(length, (1,)).astype(jnp.int32), x,
                cos_row.astype(jnp.float32), sin_row.astype(jnp.float32),
                v3(p["norm1_w"]), v3(p["norm2_w"]),
                p["wq"], p["wk"], p["wv"], p["wo"],
                p["wg"], p["wu"], p["wd"], k_cache, v_cache]
    in_specs = ([smem, vmem, vmem, vmem, vmem, vmem]
                + [any_spec] * 7 + [any_spec] * 2)
    if quant_cache:
        operands += [k_scale, v_scale]
        in_specs += [vmem, vmem]
    if quant_w:
        operands += [p[k + "_s"] for k in WEIGHT_KEYS]
        in_specs += [vmem] * 7

    xo, kc_out, vc_out = pl.pallas_call(
        functools.partial(_kernel_bigmodel, n_layers=n_layers,
                          n_heads=n_heads, head_dim=head_dim,
                          n_kv_heads=n_kv_heads, seq=s, hc=hc, eps=eps,
                          compute_dtype=cdt, quant_cache=quant_cache,
                          quant_w=quant_w),
        in_specs=in_specs,
        out_specs=[vmem, any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, e), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, e), wdt),             # wq
            pltpu.VMEM((2, e, e_kv), wdt),          # wk
            pltpu.VMEM((2, e, e_kv), wdt),          # wv
            pltpu.VMEM((2, e, e), wdt),             # wo
            pltpu.VMEM((2, e, fc), wdt),            # wg chunk
            pltpu.VMEM((2, e, fc), wdt),            # wu chunk
            pltpu.VMEM((2, fc, e), wdt),            # wd chunk
            pltpu.VMEM((_CSLOTS, b, s, e_kv), cache_dt),
            pltpu.VMEM((_CSLOTS, b, s, e_kv), cache_dt),
            pltpu.VMEM((2, b, 8, e_kv), cache_dt),
            pltpu.VMEM((2, b, 8, e_kv), cache_dt),
            pltpu.VMEM((b, e), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((_CSLOTS, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={13: 1, 14: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)
    return xo, kc_out, vc_out


def _fused_llama_decode_pipelined(x, stacked, k_cache, v_cache, length,
                                  cos_row, sin_row, k_scale, v_scale, *,
                                  n_layers: int, n_heads: int,
                                  head_dim: int, n_kv_heads: int,
                                  hidden: int, eps: float, bc: int,
                                  compute_dtype, quant_cache: bool,
                                  quant_w: bool, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b, e = x.shape
    s = k_cache.shape[2]
    e_kv = n_kv_heads * head_dim
    nc = b // bc
    p = stacked
    cdt = compute_dtype
    wdt = p["wq"].dtype                 # int8 in the w8a16 serving mode
    cache_dt = k_cache.dtype
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    v3 = lambda a: a[:, None, :]

    operands = [jnp.reshape(length, (1,)).astype(jnp.int32), x,
                cos_row.astype(jnp.float32), sin_row.astype(jnp.float32),
                v3(p["norm1_w"]), v3(p["norm2_w"]),
                p["wq"], p["wk"], p["wv"], p["wo"],
                p["wg"], p["wu"], p["wd"], k_cache, v_cache]
    in_specs = ([smem, vmem, vmem, vmem, vmem, vmem]
                + [any_spec] * 7 + [any_spec] * 2)
    if quant_cache:
        operands += [k_scale, v_scale]                   # [L, 1, E_kv] f32
        in_specs += [vmem, vmem]
    if quant_w:
        operands += [p[k + "_s"] for k in WEIGHT_KEYS]   # [L, 1, out] f32
        in_specs += [vmem] * 7

    xo, kc_out, vc_out = pl.pallas_call(
        functools.partial(_kernel_pipelined, n_layers=n_layers,
                          n_heads=n_heads, head_dim=head_dim,
                          n_kv_heads=n_kv_heads, seq=s, bc=bc,
                          nc=nc, eps=eps, compute_dtype=cdt,
                          quant_cache=quant_cache, quant_w=quant_w),
        in_specs=in_specs,
        out_specs=[vmem, any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, e), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, e), wdt),             # wq
            pltpu.VMEM((2, e, e_kv), wdt),          # wk
            pltpu.VMEM((2, e, e_kv), wdt),          # wv
            pltpu.VMEM((2, e, e), wdt),             # wo
            pltpu.VMEM((2, e, hidden), wdt),        # wg
            pltpu.VMEM((2, e, hidden), wdt),        # wu
            pltpu.VMEM((2, hidden, e), wdt),        # wd
            pltpu.VMEM((_CSLOTS, bc, s, e_kv), cache_dt),
            pltpu.VMEM((_CSLOTS, bc, s, e_kv), cache_dt),
            pltpu.VMEM((2, bc, 8, e_kv), cache_dt),
            pltpu.VMEM((2, bc, 8, e_kv), cache_dt),
            pltpu.VMEM((b, e), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 7)),
            pltpu.SemaphoreType.DMA((_CSLOTS, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={13: 1, 14: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)
    return xo, kc_out, vc_out


WEIGHT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_weights(stacked):
    """w8a16 serving mode: int8 matrices + per-(layer, out-lane) scales.

    Symmetric per-output-channel quantization — the dequant scale applies
    EXACTLY after the dot (y_j = s_j * sum_i x_i w8_ij), so the kernel's MXU
    dot runs on converted int8 codes and the only approximation is the
    rounding of the weights themselves (the fused_decode.quantize_weights
    contract). Returns a copy of ``stacked`` with each weight [L, in, out]
    replaced by int8 codes and a matching ``<key>_s`` [L, 1, out] f32 added.
    Quantize ONCE per decode dispatch (outside the token scan)."""
    out = dict(stacked)
    for key in WEIGHT_KEYS:
        w = stacked[key].astype(jnp.float32)                  # [L, in, out]
        absmax = jnp.max(jnp.abs(w), axis=1)                  # [L, out]
        s = (jnp.maximum(absmax, 1e-8) / 127.0)[:, None, :]   # [L, 1, out]
        out[key] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out[key + "_s"] = s
    return out


def replication_matrix(n_heads: int, n_kv_heads: int, head_dim: int,
                       dtype=jnp.bfloat16):
    """[E_kv, E] 0/1 matrix expanding folded kv lanes to folded q lanes
    (head h of n_heads reads kv head h // (n_heads // n_kv_heads)).
    Kept for callers that materialize an expanded view (tests, probes);
    the decode kernel itself no longer streams it."""
    e, e_kv = n_heads * head_dim, n_kv_heads * head_dim
    rep = n_heads // n_kv_heads
    ql = np.arange(e)
    kvl = (ql // head_dim // rep) * head_dim + ql % head_dim
    m = np.zeros((e_kv, e), np.float32)
    m[kvl, ql] = 1.0
    return jnp.asarray(m, dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_layers", "n_heads", "head_dim", "n_kv_heads", "hidden", "eps",
    "interpret"))
def fused_llama_decode_blocks(x, stacked, k_cache, v_cache, length,
                              cos_row, sin_row, k_scale=None, v_scale=None,
                              *, n_layers: int, n_heads: int, head_dim: int,
                              n_kv_heads: int, hidden: int, eps: float,
                              interpret: bool = False):
    """Run all LLaMA blocks for ONE token position.

    x: [B, E] embedded token; stacked: dict of [L, ...] params (keys
    norm1_w wq wk wv wo norm2_w wg wu wd, kernels in [in, out] layout,
    matmuls pre-cast to the compute dtype); k_cache/v_cache: [L, B, S,
    E_kv] folded, GQA kv heads UNEXPANDED (models/llama.py:
    init_llama_cache); length: [] int32 valid-row count; cos_row/sin_row:
    [1, E] folded rope tables for position ``length``
    (ops/rope.py:folded_tables rows — the kernel slices the kv-width
    tables out of them).

    int8 KV cache: pass int8 caches plus per-(layer, lane) dequant scales
    k_scale/v_scale [L, 1, E_kv] f32 (gpt2.quantize_cache); rows
    dequantize in-register and the new rows REQUANTIZE in-kernel with the
    same fixed scales — the fused_decode.py contract.

    Returns (x_out [B, E], k_cache', v_cache') with the caches updated IN
    PLACE (outputs alias inputs; the kernel writes the new rows itself —
    same contract as fused_decode.fused_decode_blocks).
    """
    from jax.experimental.pallas import tpu as pltpu

    b, e = x.shape
    s = k_cache.shape[2]
    e_kv = n_kv_heads * head_dim
    w8 = stacked["wq"].dtype == jnp.int8          # w8a16 serving mode
    quant_cache = k_cache.dtype == jnp.int8       # int8 KV mode
    if quant_cache:
        assert k_scale is not None and v_scale is not None
        cache_scales = (k_scale, v_scale)
    else:
        cache_scales = ()
    # compute dtype: the weight dtype for float weights; for int8 weights
    # the cache's float dtype (the returned rows scatter straight into it),
    # bf16 when the cache is int8 too
    if w8:
        cdt = jnp.bfloat16 if quant_cache else k_cache.dtype
    else:
        cdt = stacked["wq"].dtype
    # FK_LLAMA_PIPE=1 selects the manually-double-buffered kernel — weights/
    # caches as HBM refs, 3-slot chunk buffering, layer-ahead weight
    # prefetch — bit-identical to the grid kernel (shared _layer_math; see
    # fused_decode.py for the GPT measurement history of the same
    # structure). Default OFF: TPU-priced a WASH at the rescorer shape
    # (grid 17.57 / pipe 17.88 ms float, 14.72 / 14.47 w8a16, b=32 —
    # BASELINE.md round 4). Read at TRACE time — the first decode dispatch
    # bakes the value into the jit cache.
    import os
    if os.environ.get("FK_LLAMA_PIPE", "0") == "1":
        bcp = _pick_batch_chunk_pipelined(
            b, s, e, e_kv, hidden, jnp.dtype(cdt).itemsize,
            jnp.dtype(stacked["wq"].dtype).itemsize,
            jnp.dtype(k_cache.dtype).itemsize)
        if bcp > 0 and n_layers * (b // bcp) >= 2:
            return _fused_llama_decode_pipelined(
                x, stacked, k_cache, v_cache, length, cos_row, sin_row,
                k_scale, v_scale,
                n_layers=n_layers, n_heads=n_heads, head_dim=head_dim,
                n_kv_heads=n_kv_heads, hidden=hidden, eps=eps, bc=bcp,
                compute_dtype=cdt, quant_cache=quant_cache, quant_w=w8,
                interpret=interpret)
    bc = _pick_batch_chunk(b, s, e, e_kv, hidden, jnp.dtype(cdt).itemsize,
                           jnp.dtype(k_cache.dtype).itemsize)
    if bc == 0 or os.environ.get("FK_LLAMA_BIG", "0") == "1":
        # per-layer weights don't fit VMEM double-buffered (1B-class
        # geometry): the chunked-MLP big-model kernel streams them in
        # hidden chunks. FK_LLAMA_BIG=1 forces it (tests, control runs).
        hc = _pick_bigmodel_chunks(
            b, s, e, e_kv, hidden, n_layers, jnp.dtype(cdt).itemsize,
            jnp.dtype(stacked["wq"].dtype).itemsize,
            jnp.dtype(k_cache.dtype).itemsize)
        # FK_LLAMA_BIG_HC forces the chunk count (tests exercise the
        # multi-chunk accumulation on geometries where hc=1 would fit)
        hc_env = int(os.environ.get("FK_LLAMA_BIG_HC", "0"))
        if hc_env > 0 and hidden % hc_env == 0 \
                and (hidden // hc_env) % 128 == 0:
            hc = hc_env
        assert hc > 0, "caller must gate on supported()"
        return _fused_llama_decode_bigmodel(
            x, stacked, k_cache, v_cache, length, cos_row, sin_row,
            k_scale, v_scale, n_layers=n_layers, n_heads=n_heads,
            head_dim=head_dim, n_kv_heads=n_kv_heads, hidden=hidden,
            eps=eps, hc=hc, compute_dtype=cdt, quant_cache=quant_cache,
            quant_w=w8, interpret=interpret)
    grid = (n_layers, b // bc)

    mat = lambda d1, d2: pl.BlockSpec((1, d1, d2),
                                      lambda l, bi, len_r: (l, 0, 0))
    vec = lambda d: pl.BlockSpec((1, 1, d), lambda l, bi, len_r: (l, 0, 0))
    const = lambda d1, d2: pl.BlockSpec((d1, d2),
                                        lambda l, bi, len_r: (0, 0))
    in_specs = [
        pl.BlockSpec((bc, e), lambda l, bi, len_r: (bi, 0)),          # x
        const(1, e), const(1, e),                                     # rope
        vec(e),                                                       # norm1
        mat(e, e), mat(e, e_kv), mat(e, e_kv), mat(e, e),             # qkvo
        vec(e),                                                       # norm2
        mat(e, hidden), mat(e, hidden), mat(hidden, e),               # mlp
        pl.BlockSpec((1, bc, s, e_kv), lambda l, bi, len_r: (l, bi, 0, 0)),
        pl.BlockSpec((1, bc, s, e_kv), lambda l, bi, len_r: (l, bi, 0, 0)),
    ]
    if quant_cache:
        in_specs += [vec(e_kv), vec(e_kv)]                            # ks, vs
    if w8:
        # per-out-lane dequant scales, one [1, out] row per layer
        in_specs += [vec(e), vec(e_kv), vec(e_kv), vec(e),
                     vec(hidden), vec(hidden), vec(e)]
    out_specs = [
        pl.BlockSpec((bc, e), lambda l, bi, len_r: (bi, 0)),          # x_out
        pl.BlockSpec((1, bc, 8, e_kv),
                     lambda l, bi, len_r: (l, bi, len_r[0] // 8, 0)),
        pl.BlockSpec((1, bc, 8, e_kv),
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
    v3 = lambda a: a[:, None, :]
    # cache outputs ALIAS the cache inputs (operands 13/14, counting the
    # scalar prefetch at 0): the kernel writes the new rows in place
    xo, kc_out, vc_out = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers, n_heads=n_heads,
                          head_dim=head_dim, n_kv_heads=n_kv_heads,
                          seq=s, bc=bc, eps=eps, compute_dtype=cdt,
                          quant_cache=quant_cache, quant_w=w8),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, e), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={13: 1, 14: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.reshape(length, (1,)).astype(jnp.int32),
      x,
      cos_row.astype(jnp.float32), sin_row.astype(jnp.float32),
      v3(p["norm1_w"]), p["wq"], p["wk"], p["wv"], p["wo"],
      v3(p["norm2_w"]), p["wg"], p["wu"], p["wd"],
      k_cache, v_cache,
      *cache_scales,
      *([p[k + "_s"] for k in WEIGHT_KEYS] if w8 else []))
    return xo, kc_out, vc_out
