"""Learning-rate schedules and gradient clipping.

TPU-native equivalents of the reference's optimizer plumbing
(medseg/models/model_util.py):

  * ``get_scheduler`` (model_util.py:621-671) — 8 named LR policies built on
    torch ``lr_scheduler``.  Here each policy is a pure ``step -> scale``
    schedule (composable with ``optax.scale_by_schedule`` or used via
    ``make_optimizer``); the metric-driven 'plateau' policies become the
    host-side :class:`ReduceLROnPlateau` driving an
    ``optax.inject_hyperparams`` optimizer.
  * ``lr_poly`` / ``adjust_learning_rate`` (model_util.py:589-600) — the
    'poly' policy.
  * ``clip_grad`` (model_util.py:138-154) — IGEBM-style Adam-bound gradient
    clipping: |g| <= 3*sqrt(v_hat) + 0.1, as an optax transform that reads
    the second-moment estimate from downstream Adam state.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

LR_POLICIES = ("lambda", "step", "step2", "plateau", "plateau2",
               "step_warmstart", "step_warmstart2", "poly")


def lr_poly(base_lr: float, i: float, max_iter: float, power: float) -> float:
    """Polynomial decay (model_util.py:589-590)."""
    return base_lr * ((1 - float(i) / max_iter) ** power)


def make_lr_schedule(policy: str, lr_decay_iters: int = 5,
                     epoch_count: int = 0, niter: Optional[int] = None,
                     niter_decay: Optional[int] = None,
                     max_iter: Optional[int] = None,
                     power: float = 0.985) -> Callable[[jax.Array], jax.Array]:
    """Return a ``step -> multiplicative scale`` schedule for ``policy``.

    Step counts are epochs for the epoch-wise policies (matching the
    reference, which calls ``scheduler.step()`` per epoch) and iterations
    for 'poly' (adjust_learning_rate, model_util.py:593-600).
    """
    if policy == "lambda":
        assert niter is not None and niter_decay is not None

        def sched(e):
            return jnp.clip(
                1.0 - jnp.maximum(0.0, e + 1 + epoch_count - niter)
                / float(niter_decay + 1), 0.0, 1.0)
    elif policy == "step":
        def sched(e):
            return 0.5 ** jnp.floor(e / lr_decay_iters)
    elif policy == "step2":
        def sched(e):
            return 0.1 ** jnp.floor(e / lr_decay_iters)
    elif policy == "step_warmstart":
        def sched(e):
            # epoch<5: 0.1; <100: 1; <200: 0.1; >=200: 0.01 (model_util.py:644-655)
            return jnp.select(
                [e < 5, e < 100, e < 200], [0.1, 1.0, 0.1], 0.01)
    elif policy == "step_warmstart2":
        def sched(e):
            # epoch<5: 0.1; <50: 1; <100: 0.1; >=100: 0.01 (model_util.py:656-668)
            return jnp.select(
                [e < 5, e < 50, e < 100], [0.1, 1.0, 0.1], 0.01)
    elif policy == "poly":
        assert max_iter is not None

        def sched(i):
            return (1.0 - jnp.minimum(i, max_iter - 1) / max_iter) ** power
    elif policy in ("plateau", "plateau2"):
        raise ValueError(
            f"{policy!r} is metric-driven; use ReduceLROnPlateau + "
            "make_optimizer(inject=True) instead")
    else:
        raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
    return sched


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch ReduceLROnPlateau, mode='min',
    relative threshold; model_util.py:636-643).

    ``step(metric)`` returns the current LR scale; feed it to an optimizer
    built with ``make_optimizer(..., inject=True)`` by assigning
    ``opt_state.hyperparams['learning_rate']``.
    """

    def __init__(self, factor: float = 0.1, threshold: float = 0.01,
                 patience: int = 5, min_scale: float = 1e-8):
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.num_bad = 0
        return self.scale


def make_plateau_scheduler(policy: str) -> ReduceLROnPlateau:
    if policy == "plateau":
        return ReduceLROnPlateau(factor=0.1, threshold=0.01, patience=5)
    if policy == "plateau2":
        return ReduceLROnPlateau(factor=0.2, threshold=0.01, patience=5)
    raise NotImplementedError(policy)


def clip_grad_by_adam_bound(beta2: float = 0.999, eps: float = 0.1,
                            mult: float = 3.0) -> optax.GradientTransformation:
    """IGEBM Adam-bound clip (model_util.py:138-154): clamp each gradient to
    ±(3*sqrt(v_hat) + 0.1) using the *following* Adam transform's
    second-moment state.  Usage::

        tx = optax.chain(clip_grad_by_adam_bound(), optax.adam(lr))

    Implemented by tracking our own second-moment EMA (identical update to
    Adam's), so the transform is self-contained and order-independent.
    """

    def init(params):
        return {"nu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        # clip with the PREVIOUS second-moment state: the reference runs
        # clip_grad before optimizer.step(), so exp_avg_sq has not yet seen
        # the current gradient (model_util.py:142-154).
        prev_count = state["count"]
        bias = 1 - beta2 ** jnp.maximum(prev_count, 1).astype(jnp.float32)

        def clip(g, v):
            bound = mult * jnp.sqrt(v / bias) + eps
            # skip before any Adam step has populated the state
            return jnp.where(prev_count >= 1, jnp.clip(g, -bound, bound), g)

        clipped = jax.tree.map(clip, grads, state["nu"])
        # accumulate the CLIPPED gradients: the reference overwrites p.grad
        # before optimizer.step(), so Adam's exp_avg_sq (which defines the
        # next bound) sees post-clip values (model_util.py:152-154)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g,
                          state["nu"], clipped)
        return clipped, {"nu": nu, "count": prev_count + 1}

    return optax.GradientTransformation(init, update)


EPOCH_WISE_POLICIES = ("lambda", "step", "step2", "step_warmstart",
                       "step_warmstart2")


def make_optimizer(learning_rate, policy: Optional[str] = None,
                   clip: bool = False, inject: bool = False,
                   steps_per_epoch: int = 1,
                   **sched_kw) -> optax.GradientTransformation:
    """Adam with an optional named LR policy and Adam-bound clipping.

    ``inject=True`` exposes ``learning_rate`` as a runtime hyperparameter
    (for the plateau policies); otherwise a schedule (if any) is folded in.

    ``steps_per_epoch`` converts optax's per-UPDATE count to the epoch count
    the epoch-denominated policies are written in (the reference calls
    ``scheduler.step()`` once per epoch); it is ignored for the
    iteration-denominated 'poly'.  Leaving it at 1 with such a policy in a
    normal training loop would decay ~steps_per_epoch times too fast.
    """
    if policy in ("plateau", "plateau2"):
        inject = True
        policy = None
    if policy is not None:
        sched = make_lr_schedule(policy, **sched_kw)
        if policy in EPOCH_WISE_POLICIES:
            lr = lambda step: learning_rate * sched(step // steps_per_epoch)
        else:
            lr = lambda step: learning_rate * sched(step)
    else:
        lr = learning_rate
    base = optax.inject_hyperparams(optax.adam)(learning_rate=lr) if inject \
        else optax.adam(lr)
    if clip:
        return optax.chain(clip_grad_by_adam_bound(), base)
    return base
