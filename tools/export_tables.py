"""Produce the reference's .npy serving artifacts from any checkpoint.

The reference writes ``entity_embedding.npy`` / ``relation_embedding.npy``
at every save (codes/run.py §save_model ≈L103-130) — its de-facto serving
artifact. Our ``--sharded_checkpoint`` fleets deliberately never gather the
full table at save time (checkpoint.py §save_model_sharded), so the .npy
exports are produced OFFLINE by this tool: it reassembles the per-process
shard files (or reads a plain full checkpoint) and writes the two tables.

Usage:
    python tools/export_tables.py SAVE_DIR [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("save_dir")
    ap.add_argument("--out", default=None,
                    help="output dir (default: SAVE_DIR)")
    args = ap.parse_args(argv)
    out = args.out or args.save_dir

    # keep this tool chip-free: reassembly is pure host IO
    import jax

    jax.config.update("jax_platforms", "cpu")
    from knowledgegraphembedding_tpu import checkpoint as ckpt

    params, _, step, _, _ = ckpt.load_checkpoint(args.save_dir)
    os.makedirs(out, exist_ok=True)
    for name in ("entity_embedding", "relation_embedding"):
        path = os.path.join(out, f"{name}.npy")
        arr = np.asarray(params[name])
        ckpt._atomic_write(path, lambda f: np.save(f, arr))
        print(f"wrote {path} {arr.shape} (step {step})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
