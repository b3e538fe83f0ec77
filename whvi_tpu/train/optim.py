"""Optimizer & schedule for WHVI training.

Reference: ``make_optimizer`` (src/evaluation.py:15-27) — Adam(lr=1e-3)
with per-*batch* decay ``(1 + gamma * t)^(-p)``, gamma=5e-4, p=0.3.

Two reference quirks fixed here, both SURVEY.md-documented:

- the reference's ``LambdaLR(optimizer, lambda t: lambda0 * (1+gamma t)^-p)``
  multiplies the base lr in *again* (effective lr ~ lambda0^2), while its
  README and notebook document the single-applied schedule; we implement
  the documented one (``lr(t) = lr0 * (1 + gamma t)^(-p)``);
- phase 1 of the two-phase loop is supposed to freeze the likelihood's
  noise parameter but the reference's ``requires_grad = False`` lands on
  the module, not the tensor, so Adam keeps updating sigma (verified by
  execution; SURVEY.md section 0 bug 3). Here freezing is done by zeroing
  the likelihood gradient subtree under a traced phase flag, so both
  phases share one compiled train step and the freeze is exact (Adam
  moments for the frozen subtree stay identically zero, hence zero
  updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "decay_schedule",
    "decayed_adam",
    "mask_likelihood_grads",
    "mask_noise_branch_grads",
    "validate_split_head",
]


def validate_split_head(net) -> None:
    """Raise unless ``net`` has the heteroscedastic split-head structure
    the noise-freeze curriculum operates on: last layer a Parallel with
    exactly ``[mean, noise]`` branches (column order matches the split
    likelihood's ``[mean, raw_sigma]``) and a likelihood exposing
    ``.split``. Loud-by-construction: a caller who configured the freeze
    expects the curriculum, not a silent no-op (round-3 VERDICT weak #5,
    advisor finding on the hardcoded branch index).
    """
    head = net.layers[-1]
    if not (
        hasattr(net.likelihood, "split")
        and hasattr(head, "branches")
        and len(head.branches) == 2
    ):
        raise ValueError(
            "noise freeze requires a heteroscedastic split head: the "
            "last layer must be a Parallel with exactly 2 branches "
            "([mean, noise] column order) and the likelihood must "
            f"expose .split; got last layer {type(head).__name__} with "
            f"{len(getattr(head, 'branches', ()))} branches and "
            f"likelihood {type(net.likelihood).__name__}"
        )


def decay_schedule(
    lr0: float = 1e-3, gamma: float = 5e-4, p: float = 0.3
) -> optax.Schedule:
    """``lr(t) = lr0 * (1 + gamma * t)^(-p)`` with t the batch step."""

    def schedule(t):
        return lr0 * jnp.power(1.0 + gamma * t, -p)

    return schedule


def decayed_adam(
    lr0: float = 1e-3,
    gamma: float = 5e-4,
    p: float = 0.3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with the reference's polynomial decay (single-applied)."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(decay_schedule(lr0, gamma, p)),
    )


def mask_likelihood_grads(grads: dict, train_likelihood: jax.Array) -> dict:
    """Zero the likelihood gradient subtree when ``train_likelihood == 0``.

    ``train_likelihood`` is a traced 0/1 scalar so phase 1 and phase 2
    share one compiled step (SURVEY.md section 7 "two-phase training under
    jit").
    """
    flag = jnp.asarray(train_likelihood)
    return dict(
        grads,
        likelihood=jax.tree.map(lambda g: g * flag, grads["likelihood"]),
    )


def mask_noise_branch_grads(grads: dict, flag: jax.Array) -> dict:
    """Zero the gradient subtrees of the last layer's non-first Parallel
    branches (the heteroscedastic noise heads) when ``flag == 0``.

    The heteroscedastic analogue of :func:`mask_likelihood_grads`: with
    input-dependent noise the "likelihood sigma" is a network output, so
    the reference's phase-1 likelihood freeze has nothing to hold — and
    an unfrozen per-point sigma is an escape hatch that lets the mean
    under-fit (inflate sigma locally instead of fitting; real-data rows
    in docs/RESULTS.md round 3). ``flag`` is traced so the freeze
    schedule compiles into the one shared step.

    Ordering contract: ``branches == (mean, noise)`` — EXACTLY two, in
    the split likelihood's ``[mean, raw_sigma]`` column order, enforced
    up front by :func:`validate_split_head` (which raises on anything
    else rather than silently ignoring the freeze). The mask slices
    ``branches[1:]`` only so it cannot IndexError if the validator is
    bypassed; a wider head is NOT supported — freezing branches[1:] of
    a 3-branch head whose extra branch were part of the mean would
    freeze mean capacity, which is why the validator stays strict.
    """
    flag = jnp.asarray(flag)
    layers = list(grads["layers"])
    head = dict(layers[-1])
    branches = list(head["branches"])
    branches[1:] = [
        jax.tree.map(lambda g: g * flag, b) for b in branches[1:]
    ]
    head["branches"] = tuple(branches)
    layers[-1] = head
    return dict(grads, layers=tuple(layers))
