"""FrankyLlama serving benchmark on the real TPU: encode + cached decode
(greedy / beams) for the north-star composite, plus the cost of LLaMA
n-best rescoring at serving batch — the full
`brain -> beams -> rescore` chain (reference:README.md:19, unimplemented
there) priced end-to-end.

The measurement itself lives in bench.franky_llama_metrics (it is also the
"franky_llama" section of the driver's headline artifact since round 5 —
VERDICT r4 #4); this tool runs it standalone with CLI knobs.

Run on the real TPU: python tools/franky_llama_bench.py [batch] [beam_width]
[w8] — w8 (default 1) streams int8 block weights with per-out-lane scales
through the decode scans; w8=0 reverts to bf16 weights.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32, beam: int = 5, max_new: int = 25, w8: int = 1,
         int8_kv: int = 0):
    import bench
    print(json.dumps(bench.franky_llama_metrics(
        batch=batch, beam=beam, max_new=max_new, w8=bool(w8),
        int8_kv=bool(int8_kv))))


if __name__ == "__main__":
    # usage: franky_llama_bench.py [batch] [beam_width] [w8] [int8_kv]
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5,
         w8=int(sys.argv[3]) if len(sys.argv) > 3 else 1,
         int8_kv=int(sys.argv[4]) if len(sys.argv) > 4 else 0)
