"""Failure detection and recovery for long training runs.

The reference has no failure handling at all — its notion of error handling is
live ``breakpoint()`` traps on impossible states (SURVEY.md §5.3).  For
production-scale training this module provides:

- :func:`check_finite` — cheap device-side all-finite reduction over a pytree;
- :class:`TrainGuard` — wraps a train loop with NaN/Inf detection and
  automatic rollback to the last good checkpoint (elastic recovery: on
  corruption the loop resumes from the newest finite state with a fresh RNG
  fold so the same divergence is not replayed).
"""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint


def check_finite(tree) -> jnp.ndarray:
    """True iff every leaf of the pytree is fully finite (device-side)."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    flags = [
        jnp.all(jnp.isfinite(l)) for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not flags:
        return jnp.asarray(True)
    out = flags[0]
    for f in flags[1:]:
        out = jnp.logical_and(out, f)
    return out


class TrainGuard:
    """Checkpointed NaN-guard around an arbitrary ``(state) -> (state, metrics)``
    train step.

    >>> guard = TrainGuard(step_fn, ckpt_dir, save_every=50)
    >>> state = guard.run(state, num_updates=1000)
    """

    def __init__(self, step_fn, ckpt_dir: str | None = None, save_every: int = 50,
                 rng_field: str = "key", max_consecutive_failures: int = 20):
        self.step_fn = step_fn
        self.ckpt_dir = ckpt_dir or tempfile.mkdtemp(prefix="nanogrid_guard_")
        self.save_every = save_every
        self.rng_field = rng_field
        self.max_consecutive_failures = max_consecutive_failures
        self.recoveries = 0       # lifetime count (telemetry)
        self._global_step = 0     # monotonic across run() calls (epoch reuse)

    def run(self, state, num_updates: int, *step_args, on_metrics=None):
        """Advance ``num_updates`` finite updates, rolling back to the newest
        finite checkpoint on NaN/Inf corruption.  Checkpoints are numbered by a
        monotonic global counter so reusing one guard across epochs never
        collides; transient blips that recover don't count toward divergence —
        only consecutive failures without new progress do."""
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if latest_step(self.ckpt_dir) is None:
            save_checkpoint(self.ckpt_dir, self._global_step, state)
        last_good = latest_step(self.ckpt_dir)
        target = self._global_step + num_updates
        consecutive_failures = 0
        while self._global_step < target:
            new_state, metrics = self.step_fn(state, *step_args)
            if bool(check_finite((new_state, metrics))):
                state = new_state
                self._global_step += 1
                if on_metrics is not None:
                    on_metrics(self._global_step, metrics)
                if self._global_step % self.save_every == 0:
                    save_checkpoint(self.ckpt_dir, self._global_step, state)
                    last_good = self._global_step
                    consecutive_failures = 0
            else:
                # corruption: roll back to the last finite checkpoint and
                # perturb the RNG so the identical divergence is not replayed
                self.recoveries += 1
                consecutive_failures += 1
                state = restore_checkpoint(self.ckpt_dir, last_good, state)
                if hasattr(state, self.rng_field):
                    key = getattr(state, self.rng_field)
                    state = state._replace(
                        **{self.rng_field: jax.random.fold_in(key, 7919 + self.recoveries)}
                    )
                self._global_step = last_good
                if consecutive_failures > self.max_consecutive_failures:
                    raise RuntimeError(
                        "TrainGuard: repeated recoveries without progress — "
                        "training is persistently diverging"
                    )
        return state
