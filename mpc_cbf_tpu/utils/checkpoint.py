"""Checkpoint / resume for long rollouts and sweeps.

The reference has NO checkpointing (SURVEY §5.4: per-run JSON written only
at process end — a crash loses everything). Here it's first-class: an
atomic plain-npz snapshot of any pytree of arrays (sim State, warm
starts, PRNG keys, step counter). npz (not orbax) on purpose: snapshots
are a few MB of host arrays, and a single self-contained file survives
environments where orbax/tensorstore is absent.

Usage:
    ckpt = Checkpointer("/tmp/run1")
    ckpt.save(step, {"state": state, "key": key})
    step, tree = ckpt.restore_latest()   # (None, None) if nothing saved
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import numpy as np
import jax


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3):
        self.dir = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"ckpt_{step:08d}.npz")

    def save(self, step: int, tree: Any) -> str:
        """Snapshot a pytree of arrays at ``step``. Atomic (tmp + rename)."""
        leaves, treedef = jax.tree.flatten(tree)
        arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        path = self._path(step)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, __treedef__=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8), **arrs)
        os.replace(tmp, path)
        self._gc()
        return path

    def steps(self):
        out = []
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"ckpt_(\d+)\.npz", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def restore(self, step: int, like: Any) -> Any:
        """Restore the pytree saved at ``step``; ``like`` supplies the
        structure (treedef) to unflatten into. Fails loudly if the stored
        structure does not match ``like`` (silent shape-mismatch restores
        are worse than no checkpoint)."""
        with np.load(self._path(step)) as data:
            leaves = [data[f"leaf_{i}"]
                      for i in range(len([k for k in data.files
                                          if k.startswith("leaf_")]))]
            stored = bytes(data["__treedef__"]).decode() \
                if "__treedef__" in data.files else None
        treedef = jax.tree.structure(like)
        if stored is not None and stored != repr(treedef):
            raise ValueError(
                f"checkpoint treedef mismatch at step {step}:\n"
                f"  stored:   {stored}\n  expected: {treedef!r}")
        return jax.tree.unflatten(treedef, leaves)

    def restore_latest(self, like: Any) -> Tuple[Optional[int], Any]:
        steps = self.steps()
        if not steps:
            return None, None
        s = steps[-1]
        return s, self.restore(s, like)

    def _gc(self):
        steps = self.steps()
        for s in steps[: max(0, len(steps) - self.keep)]:
            try:
                os.remove(self._path(s))
            except OSError:
                pass


def checkpointed_rollout(sim, init, goals, num_steps: int, key,
                         ckpt: Checkpointer, every: int = 50):
    """Run ``sim.rollout`` in ``every``-step segments, checkpointing the
    carried state between segments and resuming from the latest snapshot
    if one exists. Returns the concatenated trajectory arrays
    (positions, velocities, success) and the final state."""
    import jax.numpy as jnp

    template = {"step": np.asarray(0), "pos": init.pos, "vel": init.vel,
                "key": key}
    start, snap = ckpt.restore_latest(template)
    state = init
    if snap is not None:
        from mpc_cbf_tpu.types import State
        state = State(pos=jnp.asarray(snap["pos"]), vel=jnp.asarray(snap["vel"]))
        key = jnp.asarray(snap["key"])
        start = int(snap["step"])
    else:
        start = 0

    chunks = []
    step = start
    while step < num_steps:
        seg = min(every, num_steps - step)
        key, sub = jax.random.split(key)
        res = sim.rollout(state, goals, seg, key=sub)
        state = res.states
        chunks.append((np.asarray(res.traj_pos), np.asarray(res.traj_vel),
                       np.asarray(res.success)))
        step += seg
        ckpt.save(step, {"step": np.asarray(step), "pos": state.pos,
                         "vel": state.vel, "key": key})
    if not chunks:
        return None, state
    tp = np.concatenate([c[0] for c in chunks])
    tv = np.concatenate([c[1] for c in chunks])
    sc = np.concatenate([c[2] for c in chunks])
    return (tp, tv, sc), state
