"""Multi-host initialization helpers.

One chip / one host needs nothing; on a multi-host TPU slice call
:func:`init_distributed` once at program start (before any jax device
query) and then build meshes exactly as on one host — the
``(data, sample)`` mesh in ``parallel.mesh`` spans all hosts' devices
and XLA routes the psum reductions over ICI within a slice and DCN
across slices. No framework code changes are needed per host count
(SURVEY.md section 2.6: the reference has no distributed layer at all;
here the same train step scales by re-sharding).

Typical multi-host launch::

    from whvi_tpu.parallel import init_distributed, make_mesh
    init_distributed()                   # reads TPU env on each host
    mesh = make_mesh(data=2, sample=jax.device_count() // 2)
"""

from __future__ import annotations

import jax

__all__ = ["init_distributed", "is_multi_host"]

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    With no arguments, autodetects from the TPU environment (the normal
    path on Cloud TPU pods). Explicit arguments support manual
    orchestration. Safe to call on single-process setups — it no-ops if
    initialization fails because there is nothing to coordinate.
    """
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    except (ValueError, RuntimeError):
        # single-process / no coordinator available: nothing to do
        _initialized = True


def is_multi_host() -> bool:
    return jax.process_count() > 1
