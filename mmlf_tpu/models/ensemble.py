"""Shift-Ensemble (ESE): weight-shared ensemble over a disparity grid.

Reference semantics (mmlf/model/ensamble.py): for every ``shift_disp`` in
``arange(disp_min, disp_max, disp_step)`` (70 members at defaults), EPI-shift
the input light field, run the wrapped UPR model, and collect
``mean + shift_disp`` / ``logvar``.  The output disparity is the member with
the per-pixel minimum logvar; the posterior is a mixture of Laplacians over a
``linspace(disp_min, disp_max, n_members)`` bin grid, with ``exp(logvar)``
used as the Laplace scale (reference quirk, :76 + feed_forward.py:9-12).

TPU-native design: the reference's Python loop of 70 separate forwards
becomes ONE ``lax.scan`` over the disparity grid — a single compiled program
whose body shifts on-device (traced disparity) and accumulates the
min-selection and the mixture posterior in the scan carry, so no
``(K, b, H, W, K)`` intermediate is ever materialized.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.shift import shift_lf
from ..ops.codecs import bin_centers
from .feed_forward import laplacian


def ensemble_grid(disp_min: float, disp_max: float,
                  disp_step: float) -> np.ndarray:
    """The member shift grid, ``arange(disp_min, disp_max, disp_step)``."""
    return np.arange(disp_min, disp_max, disp_step, dtype=np.float32)


def ensemble_forward(apply_fn, variables, h_views, v_views, i_views, d_views,
                     disp_min: float, disp_max: float, disp_step: float,
                     posterior_impl: str = 'auto', member_offsets=None):
    """Run the shift ensemble as a single scanned program.

    :param apply_fn: ``fn(variables, h, v, i, d) -> output dict`` (the UPR
        model's eval-mode apply)
    :param posterior_impl: ``'pallas'`` computes the mixture posterior with
        the VMEM-resident TPU kernel (ops/pallas/posterior.py — ~40× less
        HBM traffic than accumulating in the scan carry); ``'scan'`` keeps
        the carry accumulation (any backend); ``'auto'`` picks by backend.
    :param member_offsets: optional ``(K,)`` per-member logvar offsets
        (validate/calibrate.py post-hoc recalibration): every member's
        logvar becomes ``logvar_k - offsets[k]`` before selection, the
        member dump, and the mixture posterior.  None = reference-exact.
    :returns: dict with ``mean``, ``logvar`` (min-logvar member), ``means``,
        ``logvars`` (``(K, b, H, W)`` stacked members, reference layout) and
        ``posterior`` (``(b, H, W, K)`` Laplace mixture, channel-last)
    """
    if posterior_impl == 'auto':
        posterior_impl = 'pallas' if jax.default_backend() == 'tpu' \
            else 'scan'

    shifts = jnp.asarray(ensemble_grid(disp_min, disp_max, disp_step))
    n_members = shifts.shape[0]
    bins = bin_centers(disp_min, disp_max, n_members)
    offsets = (jnp.zeros_like(shifts) if member_offsets is None
               else jnp.asarray(member_offsets, jnp.float32))

    b, _, hh, ww, _ = h_views.shape
    init = (
        jnp.full((b, hh, ww), jnp.inf, dtype=jnp.float32),    # best logvar
        jnp.zeros((b, hh, ww), dtype=jnp.float32),            # best mean
    )
    if posterior_impl == 'scan':
        init = init + (
            jnp.zeros((b, hh, ww, n_members), dtype=jnp.float32),)

    def member(carry, xs):
        shift_disp, offset = xs
        best_lv, best_mean = carry[0], carry[1]
        hs, vs, is_, ds = shift_lf(h_views, v_views, i_views, d_views,
                                   shift_disp)
        out = apply_fn(variables, hs, vs, is_, ds)
        mean = out['mean'] + shift_disp
        logvar = out['logvar'] - offset

        take = logvar < best_lv
        best_lv = jnp.where(take, logvar, best_lv)
        best_mean = jnp.where(take, mean, best_mean)
        new_carry = (best_lv, best_mean)
        if posterior_impl == 'scan':
            post = carry[2] + laplacian(bins, mean, jnp.exp(logvar))
            new_carry = new_carry + (post,)
        return new_carry, (mean, logvar)

    carry, (means, logvars) = jax.lax.scan(member, init, (shifts, offsets))
    best_lv, best_mean = carry[0], carry[1]

    if posterior_impl == 'scan':
        posterior = carry[2] / float(n_members)
    else:
        from ..ops.pallas.posterior import ensemble_posterior
        posterior = ensemble_posterior(means, logvars, disp_min, disp_max)

    return {
        'mean': best_mean,
        'logvar': best_lv,
        'means': means,
        'logvars': logvars,
        'posterior': posterior,
    }


def ensemble_forward_sharded(apply_fn, variables, h_views, v_views,
                             i_views, d_views, disp_min: float,
                             disp_max: float, disp_step: float,
                             mesh, axis: str = 'data',
                             need_members: bool = True,
                             member_offsets=None):
    """Shift-ensemble with the MEMBER axis sharded across the device mesh.

    ESE validation is the dominant inference cost (70 forwards per scene,
    reference mmlf/model/ensamble.py:61-76); the serial scan uses one chip.
    Here each of the ``n`` devices scans ``ceil(70/n)`` members locally
    (inputs and weights replicated — no halo traffic at all), then the
    min-logvar selection is a lexicographic all-gather+select and the
    mixture posterior a ``psum``, both over ICI.  Outputs are replicated
    and bit-match the serial scan (tests/test_parallel.py).

    The grid is zero-padded to a multiple of ``n`` with dummy members that
    carry ``logvar=+inf`` and posterior weight 0, so they can never win
    the selection nor bias the mixture.

    ``need_members=False`` drops the per-member ``means``/``logvars``
    output (returned as None) and with it the two dominant all-gathers
    of the communication budget (docs/SCALING.md "--ese") — use it when
    the downstream consumer only needs the selected mean/logvar and the
    mixture posterior.
    """
    from jax.sharding import PartitionSpec as P

    shifts = ensemble_grid(disp_min, disp_max, disp_step)
    k = shifts.shape[0]
    n = mesh.shape[axis]
    kp = -(-k // n) * n
    shifts_p = np.zeros(kp, np.float32)
    shifts_p[:k] = shifts
    valid_p = np.zeros(kp, np.float32)
    valid_p[:k] = 1.0
    # offsets may be a TRACED array (the validate CLI threads them through
    # the jitted scene program so fit + recalibrated eval share a compile)
    offs_p = jnp.zeros(kp, jnp.float32)
    if member_offsets is not None:
        offs_p = offs_p.at[:k].set(
            jnp.asarray(member_offsets, jnp.float32))
    bins = bin_centers(disp_min, disp_max, k)

    b, _, hh, ww, _ = h_views.shape

    def local(shifts_l, valid_l, offs_l, h, v, i, d, variables):
        init = (
            jnp.full((b, hh, ww), jnp.inf, dtype=jnp.float32),
            jnp.zeros((b, hh, ww), dtype=jnp.float32),
            jnp.zeros((b, hh, ww, k), dtype=jnp.float32),
        )

        def member(carry, sv):
            shift_disp, w, off = sv
            best_lv, best_mean, post = carry
            hs, vs, is_, ds = shift_lf(h, v, i, d, shift_disp)
            out = apply_fn(variables, hs, vs, is_, ds)
            mean = out['mean'] + shift_disp
            logvar = jnp.where(w > 0, out['logvar'] - off, jnp.inf)

            take = logvar < best_lv
            best_lv = jnp.where(take, logvar, best_lv)
            best_mean = jnp.where(take, mean, best_mean)
            post = post + w * laplacian(bins, mean,
                                        jnp.exp(out['logvar'] - off))
            return (best_lv, best_mean, post), (mean, logvar)

        (best_lv, best_mean, post), (means_l, logvars_l) = jax.lax.scan(
            member, init, (shifts_l, valid_l, offs_l))

        post = jax.lax.psum(post, axis) / float(k)
        all_lv = jax.lax.all_gather(best_lv, axis)          # (n, b, H, W)
        all_mean = jax.lax.all_gather(best_mean, axis)
        idx = jnp.argmin(all_lv, axis=0)[None]
        best_lv = jnp.take_along_axis(all_lv, idx, axis=0)[0]
        best_mean = jnp.take_along_axis(all_mean, idx, axis=0)[0]
        if not need_members:
            return best_mean, best_lv, post
        means = jax.lax.all_gather(means_l, axis).reshape(
            kp, b, hh, ww)[:k]
        logvars = jax.lax.all_gather(logvars_l, axis).reshape(
            kp, b, hh, ww)[:k]
        return best_mean, best_lv, means, logvars, post

    spec_m = P(axis)
    rep = P()
    n_out = 5 if need_members else 3
    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_m, spec_m, spec_m, rep, rep, rep, rep, rep),
        out_specs=(rep,) * n_out, check_vma=False)
    outs = shard(jnp.asarray(shifts_p), jnp.asarray(valid_p),
                 offs_p, h_views, v_views, i_views, d_views,
                 variables)
    if need_members:
        best_mean, best_lv, means, logvars, posterior = outs
    else:
        (best_mean, best_lv, posterior), means, logvars = outs, None, None
    return {
        'mean': best_mean,
        'logvar': best_lv,
        'means': means,
        'logvars': logvars,
        'posterior': posterior,
    }


class Ensemble:
    """Object wrapper mirroring the reference's ``Ensamble(model, ...)`` API.

    ``model`` is a bound callable ``(h, v, i, d) -> output dict`` OR a pair
    ``(apply_fn, variables)``.
    """

    def __init__(self, model, val_disp_min: float, val_disp_max: float,
                 val_disp_step: float, **_ignored):
        assert val_disp_min < val_disp_max
        assert val_disp_step > 0.0
        self.disp_min = val_disp_min
        self.disp_max = val_disp_max
        self.disp_step = val_disp_step
        if isinstance(model, tuple):
            self.apply_fn, self.variables = model
        else:
            self.apply_fn, self.variables = (
                lambda _v, *args: model(*args)), None

    def __call__(self, h_views, v_views, i_views=None, d_views=None):
        return ensemble_forward(
            self.apply_fn, self.variables, h_views, v_views, i_views,
            d_views, self.disp_min, self.disp_max, self.disp_step)


# reference spelling, for drop-in familiarity (mmlf/model/ensamble.py:9)
Ensamble = Ensemble
