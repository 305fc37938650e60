"""Async / sharded checkpointing via Orbax — the pod-scale option.

The npz checkpoints (utils/checkpoint.py) are single-host, synchronous
writes — fine on one chip, a training stall on a pod. This module saves the
full train state as an Orbax StandardCheckpoint: the save is ASYNC (training
continues while buffers stream to disk) and sharded arrays are written
per-shard by the host that owns them, so a multi-host mesh checkpoints in
parallel with no gather. Reference equivalent: torch.save of {model, ema,
optimizer, epoch, ...} every epoch (train.py:515-529) — which blocks.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class AsyncTrainCheckpointer:
    """Owns one orbax AsyncCheckpointer; call .save() per epoch, .close() at
    teardown (waits for the in-flight write)."""

    def __init__(self):
        ocp = _ocp()
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path, tree: Dict, meta: Optional[Dict] = None) -> None:
        """Async save `tree` (any pytree of arrays, sharded or not) to the
        directory `path`, with json-serialisable `meta` alongside."""
        ocp = _ocp()
        path = Path(path).resolve()
        # serialise against our own in-flight write, then let orbax replace
        # the previous epoch's directory (force=True)
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
        if meta is not None:
            # tiny json, host-0 only; written before wait so a crash between
            # save and wait leaves a detectable partial checkpoint
            import jax

            if jax.process_index() == 0:
                path.parent.mkdir(parents=True, exist_ok=True)
                (path.parent / (path.name + ".meta.json")).write_text(
                    json.dumps(meta)
                )

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def restore(path, like: Dict) -> Tuple[Dict, Dict]:
    """Restore a tree saved by AsyncTrainCheckpointer.

    `like` is a pytree of arrays or ShapeDtypeStructs (with shardings for a
    mesh-restored state). Returns (tree, meta)."""
    ocp = _ocp()
    path = Path(path).resolve()
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    tree = ckptr.restore(path, args=ocp.args.StandardRestore(like))
    meta_p = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    return tree, meta
