"""Convert a reference (ALVI-Labs/frankenstein, torch) checkpoint file into a
frankenstein_tpu parameter file — and back.

The reference trains torch modules and saves ``state_dict()`` safetensors
(reference:utils/train_utils.py:171-172, e.g.
``step_5000_loss_3.1739.safetensors`` from franky_baseline_gpt2.ipynb cell 6).
This CLI maps those tensors onto our flax pytree (msgpack via
flax.serialization) so they can be decoded / fine-tuned here:

    python examples/convert_reference_checkpoint.py \
        --kind franky --src step_5000_loss_3.1739.safetensors --dst franky.msgpack

    # back to the reference format (torch-Linear layout, reference names):
    python examples/convert_reference_checkpoint.py \
        --kind franky --reverse --src franky.msgpack --dst franky.safetensors

Kinds: encoder | mae | brain_encoder | gpt | franky | simple_mae | soundstream
(see models/import_reference.py for the exact name maps).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.serialization
import jax

from frankenstein_tpu.models import import_reference as ir

IMPORTERS = {
    "encoder": ir.encoder_params,
    "mae": ir.mae_params,
    "brain_encoder": ir.brain_encoder_params,
    "gpt": lambda sd, **kw: ir.gpt_params(sd),
    "franky": ir.franky_params,
    "simple_mae": lambda sd, **kw: ir.simple_mae_params(sd),
    "soundstream": lambda sd, **kw: ir.soundstream_params(sd),
}

EXPORTERS = {
    "encoder": ir.export_encoder,
    "mae": ir.export_mae,
    "brain_encoder": ir.export_brain_encoder,
    "gpt": ir.export_gpt,
    "franky": ir.export_franky,
    "simple_mae": ir.export_simple_mae,
    "soundstream": ir.export_soundstream,
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kind", required=True, choices=sorted(IMPORTERS))
    ap.add_argument("--src", required=True,
                    help="input: .safetensors/.pt (import) or .msgpack (reverse)")
    ap.add_argument("--dst", required=True,
                    help="output: .msgpack (import) or .safetensors (reverse)")
    ap.add_argument("--reverse", action="store_true",
                    help="export our params back to the reference format")
    ap.add_argument("--n-sessions", type=int, default=0,
                    help="zero-init a date_embedding for this many sessions "
                         "(our extension; reference checkpoints have none)")
    ap.add_argument("--head", default="to_words",
                    choices=["to_words", "to_motion"],
                    help="output-head name for --reverse brain_encoder "
                         "export (to_words = Franky notebook variant, "
                         "to_motion = models/brainformer.py BrainFormer)")
    args = ap.parse_args()

    if args.reverse:
        with open(args.src, "rb") as f:
            params = flax.serialization.msgpack_restore(f.read())
        if args.kind == "brain_encoder":
            sd = ir.export_brain_encoder(params, head=args.head)
        else:
            sd = EXPORTERS[args.kind](params)
        ir.save_state_dict(sd, args.dst)
    else:
        sd = ir.load_state_dict(args.src)
        params = IMPORTERS[args.kind](sd, n_sessions=args.n_sessions)
        with open(args.dst, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                jax.tree_util.tree_map(lambda a: a, params)))
    n = len(jax.tree_util.tree_leaves(params))
    print(f"{'exported' if args.reverse else 'imported'} {args.kind}: "
          f"{n} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
