"""Checkpoint / resume via orbax.

Replaces the reference's Keras HDF5 save/load flags (model.save every 5000
CNN iters, save_weights every GAN cadence, do_old_model /
do_only_old_pe_model resume flags; ref: bbhMahoGANy.py:101-103,1133-1142,
1171-1173,1371-1375) with versioned orbax checkpoints of the FULL training
state — parameters, batch stats, all optimizer states, step counter, and the
RNG key, so resume is bit-exact (the reference's resume restarts optimizer
moments and RNG from scratch).
"""

import os
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save(state, step), restore latest or a step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, extra: dict | None = None):
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def all_steps(self):
        """Saved checkpoint indices, ascending. Needed to distinguish the
        FINAL training state (index == gan_iters) from diagnostic saves the
        workloads park above it (best-whiteness state at gan_iters+1)."""
        return sorted(self._mgr.all_steps())

    def restore(self, abstract_state: Any, step: int | None = None, extra_abstract: dict | None = None):
        """Restore into the structure of ``abstract_state`` (e.g. a freshly
        init'd state). Returns (state, extra) or (None, None) if empty.

        Falls back to a structure-free restore with a top-level field merge
        when the template has fields the checkpoint predates (e.g. CNNState
        gained ``ema`` in r3): known fields restore, new fields keep their
        freshly-initialized values. Inference paths are exact; resuming
        TRAINING from such a legacy checkpoint is not supported (optimizer
        state restores as raw dicts) and a warning is printed."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None, None
        payload = {"state": abstract_state}
        if extra_abstract:
            payload["extra"] = extra_abstract
        try:
            out = self._mgr.restore(step, args=ocp.args.StandardRestore(payload))
            return out["state"], out.get("extra")
        except Exception as e:
            import dataclasses

            raw = self._restore_numpy(step)
            raw_state = raw.get("state") if isinstance(raw, dict) else None
            if dataclasses.is_dataclass(abstract_state) and isinstance(raw_state, dict):
                fields = {f.name for f in dataclasses.fields(abstract_state)}
                known = {k: v for k, v in raw_state.items() if k in fields}
                missing = fields - set(raw_state)
                if not missing:
                    # The checkpoint is NOT structurally older than the
                    # template — the original failure was something else
                    # (I/O, sharding, corruption). Surface it rather than
                    # silently returning a partially-fresh state.
                    raise
                # A pre-EMA (r2-era) CNNState restores with ema fresh-random,
                # but BBHConfig defaults pe_ema_decay=0.999 so eval paths call
                # predict(use_ema=True) — graft ema from the restored params
                # so EMA inference degrades to plain-params inference instead
                # of evaluating random weights.
                if "ema" in missing and "params" in known:
                    known["ema"] = known["params"]
                    missing = missing - {"ema"}
                print(f"checkpoint restore: legacy layout ({e.__class__.__name__}); "
                      f"merged fields {sorted(known)}; kept fresh: {sorted(missing)}. "
                      "Inference OK; do not resume training from this state.")
                return abstract_state.replace(**known), raw.get("extra")
            raise

    def _restore_numpy(self, step: int):
        """Structure-free restore as host numpy arrays.

        A bare ``restore(step)`` re-applies the shardings recorded at save
        time, so a checkpoint written on a TPU cannot be opened on a CPU
        host (observed: offline analysis of out/bbh_r2 raised "Device TPU
        v5 lite0 was not found"). Restoring every leaf as np.ndarray is
        backend-free; callers re-device the merged state lazily."""
        import jax

        meta = self._mgr.item_metadata(step)

        def to_np_template(m):
            shape = getattr(m, "shape", None)
            dtype = getattr(m, "dtype", None)
            if shape is None or dtype is None:
                return m  # non-array leaf (scalar metadata): pass through
            return np.empty(shape, dtype)

        template = jax.tree_util.tree_map(to_np_template, meta)
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


def save_posterior_snapshot(directory: str, step: int, samples: np.ndarray):
    """Posterior-sample snapshot per eval cadence, as npz (replaces the
    reference's pickle dumps, ref: bbhMahoGANy.py:1379-1381)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"posterior_samples_{step:05d}.npz")
    np.savez_compressed(path, samples=np.asarray(samples))
    return path


def load_posterior_snapshot(path: str) -> np.ndarray:
    return np.load(path)["samples"]
