"""Attribute the decode PREFILL's 12-13 ms (b=128, 33 positions, bf16).

Compiles the production prefill program for TPU (compile only — safe to run
while nothing is timing through the tunnel) and ranks optimized-HLO ops by a
simple roofline cost model: max(bytes / HBM_BW, flops / peak(dtype)). The
tunnel's ~33 ms dispatch floor and ±2-5 ms loop-slice noise make wall-clock
attribution at this scale useless; the HLO doesn't lie (see CLAUDE.md).

Run: python tools/prefill_probe.py [--top N] [--save]
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HBM_BW = 819e9          # v5e HBM bytes/s
PEAK_BF16 = 197e12      # v5e bf16 flops/s
PEAK_F32 = 49e12

_DT_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "pred": 1, "s64": 8, "f64": 8, "u16": 2, "s16": 2}

_SHAPE_RE = re.compile(r"(bf16|f16|f32|s32|u32|s8|u8|pred|s64|f64|u16|s16)"
                       r"\[([\d,]*)\]")


def _shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES[dt], dt, n


def split_computations(hlo_text: str):
    """Yield (computation_name, [lines]) blocks from optimized HLO text."""
    name, lines = None, []
    for line in hlo_text.splitlines():
        # computation headers start at column 0: "[ENTRY ]%name (args) -> ty {"
        m = (re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s*\(.*\{\s*$", line)
             if not line[:1].isspace() else None)
        if m:
            if name is not None:
                yield name, lines
            name, lines = (("ENTRY " if m.group(1) else "") + m.group(2)), []
        elif name is not None:
            if line.strip() == "}":
                yield name, lines
                name, lines = None, []
            else:
                lines.append(line)
    if name is not None:
        yield name, lines


_DEF_RE = re.compile(r"^(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def build_symtab(hlo_text: str):
    """name -> (bytes, dtype, elems) for every instruction definition."""
    tab = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = _DEF_RE.match(line)
        if not m:
            continue
        rest = line[m.end():]
        s = _SHAPE_RE.match(rest.lstrip("("))
        if s:
            tab[m.group(1)] = _shape_bytes(s)
    return tab


def rank_ops(hlo_text_or_lines, top: int = 25, symtab=None):
    """Rank HLO instructions by max(bytes/BW, flops/peak). Returns rows of
    (est_us, kind, bytes, flops, line_snippet). ``symtab`` (from
    build_symtab) resolves operand shapes for dot flops estimation."""
    if isinstance(hlo_text_or_lines, str):
        lines_iter = hlo_text_or_lines.splitlines()
    else:
        lines_iter = hlo_text_or_lines
    symtab = symtab or {}
    rows = []
    for line in lines_iter:
        line = line.strip()
        if not ("=" in line and "(" in line):
            continue
        # instruction kind = first token after "= shape kind("
        m = re.search(r"=\s+(?:\([^)]*\)|\S+)\s+([\w-]+)\(", line)
        if not m:
            continue
        kind = m.group(1)
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast", "after-all"):
            continue
        shapes = list(_SHAPE_RE.finditer(line.split(" calls=")[0]))
        if not shapes:
            continue
        total_bytes = sum(_shape_bytes(s)[0] for s in shapes)
        flops = 0.0
        res_b, res_dt, res_n = _shape_bytes(shapes[0])
        if kind in ("dot", "convolution"):
            # resolve operand shapes from the symbol table: the operand list
            # is inside kind(...) — take the first two %names there
            argm = re.search(r"\b" + kind + r"\(([^)]*)\)", line)
            ops = _OPERAND_RE.findall(argm.group(1)) if argm else []
            if len(ops) >= 2 and ops[0] in symtab and ops[1] in symtab:
                a_b, _, a_n = symtab[ops[0]]
                b_b, _, b_n = symtab[ops[1]]
                total_bytes += a_b + b_b
                # a_n = M*K*batch, b_n = K*N*batch, res_n = M*N*batch
                k = (a_n * b_n / max(res_n, 1)) ** 0.5
                flops = 2.0 * res_n * k
            peak = PEAK_BF16 if res_dt in ("bf16", "f16") else PEAK_F32
            est = max(total_bytes / HBM_BW, flops / peak)
        else:
            est = total_bytes / HBM_BW
        rows.append((est * 1e6, kind, total_bytes, flops, line[:180]))
    rows.sort(key=lambda r: -r[0])
    return rows[:top]


def summarize(name, txt, top=25, min_us=20.0):
    """Per-computation cost summary. Fusion/wrapped bodies are skipped (their
    cost is carried by the fusion CALL in the parent); while bodies print
    separately — multiply by the trip count yourself (nn.scan over L layers
    => body runs L times)."""
    print(f"\n=== {name} ===")
    symtab = build_symtab(txt)
    for comp, lines in split_computations(txt):
        low = comp.lower()
        if "fused" in low or "wrapped" in low:
            continue
        all_rows = rank_ops(lines, 10 ** 6, symtab=symtab)
        total = sum(r[0] for r in all_rows)
        if total < min_us:  # skip cheap computations
            continue
        print(f"\n-- computation {comp}: ~{total / 1000:.3f} ms per call --")
        by_kind = {}
        for est, kind, b, f, _ in all_rows:
            by_kind[kind] = by_kind.get(kind, 0.0) + est
        for kind, us in sorted(by_kind.items(), key=lambda kv: -kv[1])[:8]:
            print(f"  {kind:<24} {us / 1000:7.3f} ms")
        print(f"  -- top {min(top, len(all_rows))} ops --")
        for est, kind, b, f, snip in all_rows[:top]:
            print(f"  {est:9.1f} us  {kind:<14} {b / 1e6:8.2f} MB "
                  f"{f / 1e9:8.2f} GF  {snip[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--save", action="store_true",
                    help="write full HLO to /tmp/hlo_prefill_*.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models import gpt2

    model, cfg = g._flagship()
    c = cfg.gpt
    b, max_new = 128, 25

    x1 = jnp.zeros((1, 768, 256), jnp.float32)
    y1 = jnp.zeros((1, 25), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    idx0 = jnp.full((b, 1), 50256, jnp.int32)
    max_len = 1 + 32 + max_new + 1

    def prefill_fn(params, prefix):
        def run(mdl):
            cache = gpt2.init_cache(c, b, max_len, dtype=jnp.bfloat16)
            return mdl.prefill(idx0, prefix, cache)
        return model.apply(params, method=lambda m: run(m.llm_model))

    prefix = jnp.zeros((b, 32, c.n_embd), jnp.float32)
    lowered = jax.jit(prefill_fn).lower(params, prefix)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.save:
        Path("/tmp/hlo_prefill_current.txt").write_text(txt)
    summarize("prefill(current)", txt, args.top)
    ca = compiled.cost_analysis()
    if ca:
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"\n  compiled.cost_analysis: flops={ca.get('flops', 0) / 1e9:.1f} GF "
              f"bytes={ca.get('bytes accessed', 0) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
