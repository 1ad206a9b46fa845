"""Thirion and diffeomorphic demons solvers.

Per iteration (reference ``src/regularization/Demons/DemonsThirions.cpp:18-42``
and ``DemonsDiffeomorphic.cpp:15-35``):
  1. warp the (already pyramid-level, already refinement-warped) moving image
     by the current motion estimate,
  2. recompute image derivatives on the warped image,
  3. demons correspondence force,
  4. Gaussian-smooth the correspondence ("fluid" smoothing),
  5. Thirion: compose or add the correspondence into the motion
     (per ``MotionAccumulation``); diffeomorphic: exponentiate the smoothed
     correspondence (scaling-and-squaring) then always compose,
  6. Gaussian-smooth the motion ("diffusion" smoothing).

With ``use_pallas`` the whole iteration runs as TWO fused Pallas kernels
(``pallas_kernels.demons_fused``): warp+gradient+force+fluid-smooth, then
compose+diffusion-smooth — each intermediate stays in VMEM instead of
round-tripping HBM. The same runtime displacement-bound checks as the
unfused path guard an exact-gather jnp fallback, so results are identical
for any input.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from opticalflow2d_tpu.config import MotionAccumulation
from opticalflow2d_tpu.ops.conv import gaussian_smooth
from opticalflow2d_tpu.ops.warp import (
    warp2d,
    compose,
    expmap,
    _sample_coords,
    _displacement_bounded,
)
from opticalflow2d_tpu.solvers.base import derivatives, demons_force


def logger_sums(u_new: jnp.ndarray, u_prev: jnp.ndarray,
                use_pallas: bool = False) -> jnp.ndarray:
    """Logger partial pair ``[sum |u_new - u_prev|, sum |u_prev|]`` (pixel
    magnitudes; reference src/Logger.cpp:30-60 tracks their ratio /N /N).
    Full-array order, so ``sums/N`` equals ``ops.reduce.motion_norm``
    bitwise — the driver's error from these matches ``_rel_step_error``.

    With ``use_pallas``, extents past 8192 lanes dispatch to the Mosaic
    norm kernel (``pallas_kernels.logger_norms``): the jnp sqrt+reduce
    below is one of the 16384^2 remote-compile walls when it sits inside
    an iteration loop (r8 probe_16384_i/j). <= 8192 stays bit-pinned jnp.
    """
    if use_pallas and max(u_prev.shape[1:]) > 8192:
        from opticalflow2d_tpu.pallas_kernels.logger_norms import (
            logger_norms_feasible, logger_norms_pallas)

        if logger_norms_feasible(*u_prev.shape[1:]):
            return logger_norms_pallas(u_new, u_prev)
    diff = u_new - u_prev
    dsum = jnp.sum(jnp.sqrt(diff[0] ** 2 + diff[1] ** 2))
    psum = jnp.sum(jnp.sqrt(u_prev[0] ** 2 + u_prev[1] ** 2))
    return jnp.stack([dsum, psum])


def expmap_identity_regime(sigma_i: float, sigma_x: float,
                           maxabs_bug: bool = False) -> bool:
    """True when the diffeomorphic exp map is the identity for EVERY
    reachable correspondence field: the smoothed force magnitude is
    bounded by ``sigma_x/(2*sigma_i)`` (AM-GM on the force denominator —
    |c| = |diff||g| / (|g|^2 + (sigma_i/sigma_x)^2 diff^2); renormalized
    Gaussian smoothing is a convex combination and preserves it), and for
    bounds <= 0.5 the squaring count is 0 — the reference's nsquares == 0
    early return (``src/Motion.cpp:257-260``). The diffeomorphic step is
    then exactly the Thirion composition step. The 1.0001 factor guards
    the boundary case where float rounding could push a measured maxabs
    an ulp past an exactly-0.5 bound; ``maxabs_bug`` inflates the
    measured value by up to sqrt(2) (y-component doubling), so bug-compat
    configs are excluded."""
    from opticalflow2d_tpu.ops.warp import static_expmap_nsq

    return (not maxabs_bug and sigma_i > 0
            and static_expmap_nsq(sigma_x / (2.0 * sigma_i) * 1.0001) == 0)


def onepass_routed(sigma_i: float, sigma_x: float, kernelwidth: int,
                   warp_halo: int, use_pallas: bool, diffeomorphic: bool,
                   maxabs_bug: bool = False,
                   conv_flatwrap: bool = False) -> bool:
    """Whether ``make_demons_step`` routes to the one-pass kernel for
    these parameters (shape feasibility is checked separately at trace
    time). Exported so the huge-grid phased driver can tell which demons
    configs have an in-program 16384^2 path (engine.registration)."""
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        onepass_supported,
    )

    return (
        use_pallas
        and warp_halo > 0
        and not conv_flatwrap
        and (not diffeomorphic
             or expmap_identity_regime(sigma_i, sigma_x, maxabs_bug))
        and onepass_supported(warp_halo, kernelwidth, sigma_i, sigma_x)
    )


def make_demons_step(
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    diffeomorphic: bool,
    accumulation: MotionAccumulation = MotionAccumulation.COMPOSITION,
    conv_flatwrap: bool = False,
    maxabs_bug: bool = False,
    warp_halo: int = 0,
    use_pallas: bool = False,
    with_errors: bool = False,
):
    """Build the demons step ``(u, iref, imov) -> u`` (or ``-> (u, sums)``
    with ``with_errors`` — ``sums = logger_sums(u_new, u)``, computed
    inside the one-pass kernel where it is free). ``imov`` is the
    refinement-level warped moving image (the reference's ``Iaux``)."""
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        fused_supported, fused_feasible)
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        onepass_supported, onepass_feasible)

    use_fused = (
        use_pallas
        and warp_halo > 0
        and not conv_flatwrap  # fused kernels implement the clipped smooth
        and fused_supported(warp_halo, kernelwidth)
    )
    # Single-pass kernel: the whole iteration in one HBM round trip
    # (demons_onepass). Preferred over the two-kernel path wherever its
    # static preconditions and shape tiers allow — for Thirion always,
    # for diffeomorphic in the exp-map identity regime (where the two
    # steps coincide, see expmap_identity_regime; this is also the only
    # in-program 16384^2 demons path, RESULTS.md "16384^2").
    use_onepass = onepass_routed(
        sigma_i, sigma_x, kernelwidth, warp_halo, use_pallas,
        diffeomorphic, maxabs_bug, conv_flatwrap,
    )

    if use_fused:
        fused = _make_fused_step(
            sigma_i, sigma_x, sigma_diffusion, sigma_fluid, kernelwidth,
            diffeomorphic, accumulation, maxabs_bug, warp_halo,
        )
    if use_onepass:
        onepass = _make_onepass_step(
            sigma_i, sigma_x, sigma_diffusion, sigma_fluid, kernelwidth,
            # Diffeomorphic demons always composes (DemonsDiffeomorphic.
            # cpp:30-33); Thirion follows the configured accumulation.
            MotionAccumulation.COMPOSITION if diffeomorphic else accumulation,
            warp_halo, with_errors,
        )

    def step(u: jnp.ndarray, iref: jnp.ndarray, imov: jnp.ndarray):
        # Shape gates evaluated at trace time: the fused kernels need a
        # measured (tile, vmem-limit) tier at this (ny, halo) — otherwise
        # run the op-chain step below (its warps/composes use the lighter
        # pallas gather, or the XLA roll path past ITS tiers).
        if use_onepass and onepass_feasible(u.shape[1], u.shape[2],
                                            warp_halo, kernelwidth):
            return onepass(u, iref, imov)
        huge = max(u.shape[1:]) > 8192
        u_prev = u
        if use_fused and fused_feasible(u.shape[1], u.shape[2], warp_halo):
            u = fused(u, iref, imov)
            return (u, logger_sums(u, u_prev, use_pallas)) if with_errors else u
        iwar = warp2d(imov, u, warp_halo, use_pallas)
        d = derivatives(iref, iwar)
        c = demons_force(d, sigma_i, sigma_x)
        c = gaussian_smooth(c, sigma_fluid, kernelwidth, flatwrap=conv_flatwrap)
        if diffeomorphic:
            static_nsq = None
            if huge:
                # >8192 lanes: the dynamic exp map's global maxabs feeding
                # a data-dependent fori_loop trip count is a remote-compile
                # wall (RESULTS.md "16384^2"); the squaring count comes
                # from the static correspondence bound instead. c is the
                # smoothed demons force, whose per-pixel MAGNITUDE (what
                # motion_maxabs measures) obeys |c| = |diff||g| / (|g|^2 +
                # (sigma_i/sigma_x)^2 diff^2) <= sigma_x/(2*sigma_i) by
                # AM-GM (demons_onepass.py:33-46); renormalized Gaussian
                # smoothing is a convex combination and preserves the
                # bound. For bounds <= 0.5
                # the static count is 0 — bit-identical to the dynamic map
                # (see ops.warp.static_expmap_nsq).
                if sigma_i <= 0:
                    raise ValueError(
                        "diffeomorphic demons past 8192 lanes needs "
                        "sigma_i > 0: the exp map squaring count is bound "
                        "statically by sigma_x/(2*sigma_i) there (the "
                        "dynamic maxabs path does not compile at 16384^2)"
                    )
                from opticalflow2d_tpu.ops.warp import static_expmap_nsq

                static_nsq = static_expmap_nsq(sigma_x / (2.0 * sigma_i))
            c = expmap(c, maxabs_bug=maxabs_bug, halo=warp_halo,
                       use_pallas=use_pallas, static_nsq=static_nsq)
            u = compose(u, c, warp_halo, use_pallas)
        elif accumulation == MotionAccumulation.COMPOSITION:
            u = compose(u, c, warp_halo, use_pallas)
        else:
            u = u + c
        u = gaussian_smooth(u, sigma_diffusion, kernelwidth, flatwrap=conv_flatwrap)
        return (u, logger_sums(u, u_prev, use_pallas)) if with_errors else u

    return step


def _make_onepass_step(
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    accumulation: MotionAccumulation,
    halo: int,
    with_errors: bool = False,
):
    """The single-kernel Thirion iteration with an exact-gather jnp
    fallback. One runtime check only (the motion's displacement bound for
    the warp stage); the correspondence bound is static
    (``demons_onepass.onepass_supported``)."""
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas,
    )

    addition = accumulation == MotionAccumulation.ADDITION

    def exact_full(args):
        u, iref, imov = args
        iwar = warp2d(imov, u, 0)
        d = derivatives(iref, iwar)
        c = demons_force(d, sigma_i, sigma_x)
        c = gaussian_smooth(c, sigma_fluid, kernelwidth)
        u_new = u + c if addition else compose(u, c, 0)
        u_new = gaussian_smooth(u_new, sigma_diffusion, kernelwidth)
        return (u_new, logger_sums(u_new, u)) if with_errors else u_new

    def fused_full(args):
        u, iref, imov = args
        return thirion_onepass_pallas(
            imov, iref, u, sigma_i, sigma_x, sigma_fluid, sigma_diffusion,
            kernelwidth, halo, addition, with_errors=with_errors,
        )

    def step(u: jnp.ndarray, iref: jnp.ndarray, imov: jnp.ndarray) -> jnp.ndarray:
        from opticalflow2d_tpu.ops import warp as _warp

        if max(u.shape[1:]) > _warp._EXACT_FALLBACK_MAX_EXTENT:
            # Trust mode past 8192 lanes: the exact-gather fallback branch
            # cannot exist in a 16384^2 program (its compilation kills the
            # remote helper — same wall as ops.warp's unconditional fast
            # path). The level driver's independently computed fallback
            # predicate still lands in ``LevelTrace.fallbacks``, so a halo
            # violation is visible; the violating pixels degrade instead
            # of falling back.
            return fused_full((u, iref, imov))
        px, py = _sample_coords(u)
        return lax.cond(
            _displacement_bounded(imov[None], px, py, halo),
            fused_full, exact_full, (u, iref, imov),
        )

    return step


def _make_fused_step(
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    diffeomorphic: bool,
    accumulation: MotionAccumulation,
    maxabs_bug: bool,
    halo: int,
):
    """The two-kernel fused demons iteration with exact-gather fallbacks.

    Correspondence: one Pallas pass when the motion is displacement-bounded
    (the same runtime predicate the unfused warp2d uses), jnp exact chain
    otherwise. Update: one Pallas compose+smooth pass when the smoothed
    correspondence is bounded (it is, after sigma_fluid smoothing, except
    in pathological cases), jnp otherwise. Diffeomorphic: the exp map runs
    on the fused compose kernel between the two passes.
    """
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas,
        compose_smooth_pallas,
    )

    # Thirion composition: the smoothed correspondence is statically
    # bounded by sigma_x/(2*sigma_i) (AM-GM on the force denominator, see
    # demons_onepass), so the compose pass only needs that halo — the same
    # cut the one-pass kernel makes (halo_c), which also keeps the two
    # paths' tap chains identical expression trees (bit-identical outputs).
    # Diffeomorphic keeps the full halo: the exp map's squarings can grow
    # the displacement beyond the force bound.
    import math as _math

    # sigma_i <= 0 has no finite force bound (the reference divides by it,
    # DemonsThirions.cpp:24 — the force is then unbounded/NaN-guarded), so
    # keep the full halo instead of dividing by zero at trace time.
    halo_c = (halo if diffeomorphic or sigma_i <= 0
              else min(halo, max(1, _math.ceil(sigma_x / (2.0 * sigma_i)))))

    def exact_corr(args):
        u, iref, imov = args
        iwar = warp2d(imov, u, 0)
        d = derivatives(iref, iwar)
        c = demons_force(d, sigma_i, sigma_x)
        return gaussian_smooth(c, sigma_fluid, kernelwidth)

    def fused_corr(args):
        u, iref, imov = args
        return demons_correspondence_pallas(
            imov, iref, u, sigma_i, sigma_x, sigma_fluid, kernelwidth, halo
        )

    def exact_update(args):
        u, c = args
        return gaussian_smooth(compose(u, c, 0), sigma_diffusion, kernelwidth)

    def fused_update(args):
        u, c = args
        return compose_smooth_pallas(u, c, sigma_diffusion, kernelwidth,
                                     halo_c)

    def step(u: jnp.ndarray, iref: jnp.ndarray, imov: jnp.ndarray) -> jnp.ndarray:
        px, py = _sample_coords(u)
        c = lax.cond(
            _displacement_bounded(imov[None], px, py, halo),
            fused_corr, exact_corr, (u, iref, imov),
        )
        if diffeomorphic:
            c = expmap(c, maxabs_bug=maxabs_bug, halo=halo, use_pallas=True)
        if diffeomorphic or accumulation == MotionAccumulation.COMPOSITION:
            pxc, pyc = _sample_coords(c)
            return lax.cond(
                _displacement_bounded(u, pxc, pyc, halo_c),
                fused_update, exact_update, (u, c),
            )
        return gaussian_smooth(u + c, sigma_diffusion, kernelwidth)

    return step
