"""Good-line-cutting preconditioner: information-maximizing sub-segment
selection, fully batched.

Capability parity with the reference's production path
``estimateProjUncertainty_submodular`` (stereoFrameHandler.cpp:1618-1764) and
its helpers ``getPoseInfoOnLine``/``getPoseInfoPoint``/``updateEndPointByRatio``
(:1342-1470): per matched line, choose cut ratios (r0, r1) for the two
endpoints maximizing the log-volume (or min-eigenvalue) of the summed 6x6
pose information matrix.

TPU-native design: the reference loops lines sequentially, each running a
greedy 8-neighbor walk. Here all lines take coordinate-ascent steps in
parallel inside one ``lax.while_loop``: each iteration evaluates all 8
candidate (r0, r1) moves for every line at once (vmapped closed-form info
matrices + batched Cholesky log-dets) and applies each line's best improving
move against the current "rest" information. Same (0.05-step grid, r0+r1<=1,
range-clamped) feasible set, same objective; parallel instead of sequential
sweeps (the objective's submodularity keeps both converging to equivalent
cuts — validated against the simulator invariants in tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gfplslam_tpu.config import CameraParams
from gfplslam_tpu.models.frame import StereoLines
from gfplslam_tpu.models.pose_opt import LineMatches, PointMatches

# 8-neighborhood on the (r0, r1) grid (:1624-1633)
_NEIGHBOR_STEPS = np.array([
    [1, 0], [-1, 0], [0, 1], [0, -1],
    [1, 1], [1, -1], [-1, 1], [-1, -1],
], dtype=np.float32)


def _proj_jac(cam: CameraParams, p: jax.Array) -> jax.Array:
    """d(u,v)/d(X,Y,Z) pinhole Jacobian (getJacob3D_2D)."""
    x, y, z = p[0], p[1], p[2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz2 = iz * iz
    return jnp.stack([
        jnp.stack([cam.fx * iz, 0.0 * iz, -cam.fx * x * iz2]),
        jnp.stack([0.0 * iz, cam.fy * iz, -cam.fy * y * iz2]),
    ])


def _residual_jac(cam: CameraParams, p: jax.Array, lx: jax.Array,
                  ly: jax.Array, homog_th: float = 1e-7) -> jax.Array:
    """d(l . proj(p))/d(twist) closed form (shared with the pose solver)."""
    gx, gy, gz = p[0], p[1], p[2]
    fgz2 = cam.fx / jnp.maximum(homog_th, gz * gz)
    return jnp.stack([
        fgz2 * lx * gz,
        fgz2 * ly * gz,
        -fgz2 * (gx * lx + gy * ly),
        -fgz2 * (gx * gy * lx + gy * gy * ly + gz * gz * ly),
        fgz2 * (gx * gx * lx + gz * gz * lx + gx * gy * ly),
        fgz2 * (gx * gz * ly - gy * gz * lx),
    ])


def line_info_factors(cam: CameraParams, dt: jax.Array, sp3d: jax.Array,
                      ep3d: jax.Array, cov_s: jax.Array, cov_e: jax.Array,
                      le_obs: jax.Array, r0: jax.Array, r1: jax.Array
                      ) -> tuple[jax.Array, jax.Array]:
    """Rank-2 factorization of one cut line's pose information:
    info = J diag(d) J^T with J [6, 2] = [j_start, j_end] and d the inverse
    residual variances (getPoseInfoOnLine structure, :1342-1411). The
    factored form lets the cut search score candidates with 2x2
    determinant-lemma updates instead of 6x6 Cholesky factorizations.
    """
    sp = (1 - r0) * sp3d + r0 * ep3d
    ep = (1 - r1) * ep3d + r1 * sp3d
    cov_sp = (1 - r0) ** 2 * cov_s + r0 ** 2 * cov_e
    cov_ep = (1 - r1) ** 2 * cov_e + r1 ** 2 * cov_s
    rot = dt[:3, :3]
    lx, ly = le_obs[0], le_obs[1]

    def endpoint_info(p_prev, cov_p):
        pc = rot @ p_prev + dt[:3, 3]
        j_proj = _proj_jac(cam, pc)          # [2,3]
        a = j_proj @ rot                     # [2,3]
        cov_uv = a @ cov_p @ a.T             # [2,2]
        j_loss = jnp.stack([lx, ly])
        cov_r = j_loss @ cov_uv @ j_loss     # scalar residual variance
        j_r = _residual_jac(cam, pc, lx, ly)  # [6]
        return j_r, cov_r

    js, cs = endpoint_info(sp, cov_sp)
    je, ce = endpoint_info(ep, cov_ep)
    d = jnp.stack([1.0 / jnp.maximum(cs, 1e-12),
                   1.0 / jnp.maximum(ce, 1e-12)])
    return jnp.stack([js, je], axis=-1), d


def line_info_factors_batch(cam: CameraParams, dt: jax.Array,
                            sp3d: jax.Array, ep3d: jax.Array,
                            cov_s: jax.Array, cov_e: jax.Array,
                            le_obs: jax.Array, r0: jax.Array, r1: jax.Array
                            ) -> tuple[jax.Array, jax.Array]:
    """Structure-of-arrays form of `line_info_factors` over a flat batch:
    identical math, but every intermediate is a [B] component vector instead
    of a vmapped [B, 2..6]-trailing tensor. The trailing dims of the vmapped
    form (2/3/6) use 2-5% of the 128-lane VPU registers they occupy; with the
    batch in the lane dimension the same arithmetic runs at full width (the
    cut search evaluates B = n_ln_match*9 = 4608 candidates per iteration).
    Returns (j [B, 6, 2], d [B, 2]); assembled only at the boundary so the
    rank-4 scorer's einsum/solve code is unchanged."""
    rot = dt[:3, :3]
    tr = dt[:3, 3]
    lx, ly = le_obs[:, 0], le_obs[:, 1]

    def lerp3(a, b, r):
        return [(1 - r) * a[:, k] + r * b[:, k] for k in range(3)]

    def cov_mix(ca, cb, ra, rb):
        # (1-ra)^2 * ca + rb^2 * cb, as the 6 unique symmetric components
        wa, wb = (1 - ra) ** 2, rb ** 2
        return {k: wa * ca[:, i, j] + wb * cb[:, i, j]
                for k, (i, j) in (("00", (0, 0)), ("01", (0, 1)),
                                  ("02", (0, 2)), ("11", (1, 1)),
                                  ("12", (1, 2)), ("22", (2, 2)))}

    def endpoint(p, c):
        # p: 3 x [B] prev-frame point; c: dict of 6 cov components [B]
        x = rot[0, 0] * p[0] + rot[0, 1] * p[1] + rot[0, 2] * p[2] + tr[0]
        y = rot[1, 0] * p[0] + rot[1, 1] * p[1] + rot[1, 2] * p[2] + tr[1]
        z = rot[2, 0] * p[0] + rot[2, 1] * p[1] + rot[2, 2] * p[2] + tr[2]
        iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz2 = iz * iz
        # b = (l . J_proj) @ rot, components b_m = lx*a0m + ly*a1m
        b = [lx * (cam.fx * iz * rot[0, m] - cam.fx * x * iz2 * rot[2, m])
             + ly * (cam.fy * iz * rot[1, m] - cam.fy * y * iz2 * rot[2, m])
             for m in range(3)]
        cov_r = (b[0] * b[0] * c["00"] + b[1] * b[1] * c["11"]
                 + b[2] * b[2] * c["22"]
                 + 2.0 * (b[0] * b[1] * c["01"] + b[0] * b[2] * c["02"]
                          + b[1] * b[2] * c["12"]))
        # _residual_jac components (same closed form, homog_th=1e-7)
        fgz2 = cam.fx / jnp.maximum(1e-7, z * z)
        j = [fgz2 * lx * z,
             fgz2 * ly * z,
             -fgz2 * (x * lx + y * ly),
             -fgz2 * (x * y * lx + y * y * ly + z * z * ly),
             fgz2 * (x * x * lx + z * z * lx + x * y * ly),
             fgz2 * (x * z * ly - y * z * lx)]
        return j, cov_r

    js, cs = endpoint(lerp3(sp3d, ep3d, r0), cov_mix(cov_s, cov_e, r0, r0))
    je, ce = endpoint(lerp3(ep3d, sp3d, r1), cov_mix(cov_e, cov_s, r1, r1))
    d = jnp.stack([1.0 / jnp.maximum(cs, 1e-12),
                   1.0 / jnp.maximum(ce, 1e-12)], axis=-1)
    j = jnp.stack([jnp.stack(js, axis=-1), jnp.stack(je, axis=-1)], axis=-1)
    return j, d


def pose_info_line(cam: CameraParams, dt: jax.Array, sp3d: jax.Array,
                   ep3d: jax.Array, cov_s: jax.Array, cov_e: jax.Array,
                   le_obs: jax.Array, r0: jax.Array, r1: jax.Array
                   ) -> jax.Array:
    """6x6 pose information of one cut line (getPoseInfoOnLine, :1342-1411).

    ``dt`` is T_curr<-prev (the reference's DT_inv). Endpoints/covariances
    are interpolated by the cut ratios before transport.
    """
    j, d = line_info_factors(cam, dt, sp3d, ep3d, cov_s, cov_e, le_obs,
                             r0, r1)
    return (j * d[None, :]) @ j.T


def pose_info_point(cam: CameraParams, dt: jax.Array, p3d: jax.Array,
                    obs: jax.Array) -> jax.Array:
    """6x6 pose information of one point (getPoseInfoPoint, :1414-1447)."""
    pc = dt[:3, :3] @ p3d + dt[:3, 3]
    iz = 1.0 / jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
    proj = jnp.stack([cam.fx * pc[0] * iz + cam.cx,
                      cam.fy * pc[1] * iz + cam.cy])
    err = proj - obs
    j = _residual_jac(cam, pc, err[0], err[1])
    r = jnp.linalg.norm(err)
    j = j / jnp.maximum(1e-7, r)
    return jnp.outer(j, j) * (r * r)  # == J_aux J_aux^T of the reference


def _det4(m: jax.Array) -> jax.Array:
    """Explicit 4x4 determinant by cofactor expansion on 2x2 minors
    (batched; avoids LU-based slogdet on tiny matrices)."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]; d = m[..., 0, 3]
    e = m[..., 1, 0]; f = m[..., 1, 1]; g = m[..., 1, 2]; h = m[..., 1, 3]
    i = m[..., 2, 0]; j = m[..., 2, 1]; k = m[..., 2, 2]; l = m[..., 2, 3]
    mm = m[..., 3, 0]; n = m[..., 3, 1]; o = m[..., 3, 2]; p = m[..., 3, 3]
    kp_lo = k * p - l * o
    jp_ln = j * p - l * n
    jo_kn = j * o - k * n
    ip_lm = i * p - l * mm
    io_km = i * o - k * mm
    in_jm = i * n - j * mm
    return (a * (f * kp_lo - g * jp_ln + h * jo_kn)
            - b * (e * kp_lo - g * ip_lm + h * io_km)
            + c * (e * jp_ln - f * ip_lm + h * in_jm)
            - d * (e * jo_kn - f * io_km + g * in_jm))


def _logdet_pd(m: jax.Array) -> jax.Array:
    """log det of a (near-)PD 6x6 via Cholesky (linespec.cpp logdet)."""
    l = jnp.linalg.cholesky(m + 1e-9 * jnp.eye(6, dtype=m.dtype))
    d = jnp.diagonal(l)
    val = 2.0 * jnp.sum(jnp.log(jnp.maximum(d, 1e-30)))
    return jnp.where(jnp.all(jnp.isfinite(d)), val, -jnp.inf)


def _min_eig(m: jax.Array) -> jax.Array:
    return jnp.linalg.eigvalsh(m)[0]


class CutResult(NamedTuple):
    r0: jax.Array        # [M] start-point cut ratios
    r1: jax.Array        # [M]
    info: jax.Array      # [M, 6, 6] per-line info at the final ratios
    info_sum: jax.Array  # [6, 6]
    iters: jax.Array     # scalar int32


@partial(jax.jit, static_argnames=("cam", "step", "use_logdet", "max_steps"))
def cut_lines(cam: CameraParams, dt: jax.Array, lns: LineMatches,
              cov_s: jax.Array, cov_e: jax.Array, pts: PointMatches,
              step: float = 0.05, rng_lo: float = 0.0, rng_hi: float = 1.0,
              use_logdet: bool = True, max_steps: int = 10) -> CutResult:
    """Parallel coordinate-ascent line cutting (submodular solver,
    :1618-1764). ``dt`` = T_curr<-prev."""
    m = lns.sp3d.shape[0]

    def factors(r0, r1):
        """Candidate factors via the lane-batched component form.
        ``r0``/``r1``: [M] (current ratios) or [M, C] (candidate grid) —
        the candidate axis is flattened into the batch so every evaluation
        runs at full VPU width (see `line_info_factors_batch`)."""
        if r0.ndim == 1:
            j, d = line_info_factors_batch(
                cam, dt, lns.sp3d, lns.ep3d, cov_s, cov_e, lns.le_obs,
                r0, r1)
            return j, jnp.where(lns.valid[:, None], d, 0.0)
        mm, cc = r0.shape

        def rep(a):
            return jnp.broadcast_to(
                a[:, None], (mm, cc) + a.shape[1:]
            ).reshape((mm * cc,) + a.shape[1:])

        j, d = line_info_factors_batch(
            cam, dt, rep(lns.sp3d), rep(lns.ep3d), rep(cov_s), rep(cov_e),
            rep(lns.le_obs), r0.reshape(-1), r1.reshape(-1))
        j = j.reshape(mm, cc, 6, 2)
        d = jnp.where(lns.valid[:, None, None], d.reshape(mm, cc, 2), 0.0)
        return j, d

    def info_of(j, d):
        return jnp.einsum("...ik,...k,...jk->...ij", j, d, j)

    pt_infos = jax.vmap(lambda p, o: pose_info_point(cam, dt, p, o))(
        pts.p3d, pts.obs)
    pt_sum = jnp.sum(jnp.where(pts.valid[:, None, None], pt_infos, 0.0), 0)

    r0 = jnp.zeros(m)
    r1 = jnp.zeros(m)
    j0, d0 = factors(r0, r1)
    steps = jnp.asarray(_NEIGHBOR_STEPS * step)

    def cand_metrics_logdet(total, j_own, d_own, js, ds):
        """Rank-4 determinant lemma against the SHARED total information:
        logdet(total - own + cand) = logdet(total)
        + logdet(I4 + D U^T total^-1 U) with U = [j_own | j_cand] ([6, 4])
        and D = diag(-d_own, +d_cand). ONE 6x6 Cholesky per iteration (of
        the total) replaces the per-line factorization of `rest`; every
        (line, candidate) costs a shared-triangular solve + a 4x4
        determinant. Scores differ from the per-line form only by the
        common logdet(total) shift, which cancels in the argmax."""
        l = jnp.linalg.cholesky(total + 1e-8 * jnp.eye(6))      # [6,6]
        u = jnp.concatenate([
            jnp.broadcast_to(j_own[:, None], js.shape), js], -1)  # [M,9,6,4]
        d4 = jnp.concatenate([
            jnp.broadcast_to(-d_own[:, None], ds.shape), ds], -1)  # [M,9,4]
        y = jax.scipy.linalg.solve_triangular(
            l, u.reshape(-1, 6, 4).transpose(1, 0, 2).reshape(6, -1),
            lower=True).reshape(6, -1, 4).transpose(1, 0, 2)    # [M*9,6,4]
        g = jnp.einsum("bir,bis->brs", y, y).reshape(*ds.shape[:2], 4, 4)
        m4 = jnp.eye(4) + d4[..., :, None] * g                  # [M,9,4,4]
        det = _det4(m4)
        val = jnp.where(det > 0, jnp.log(jnp.maximum(det, 1e-30)), -jnp.inf)
        return jnp.where(jnp.isfinite(val), val, -jnp.inf)

    def cand_metrics_mineig(rest, js, ds):
        cand_infos = info_of(js, ds)                          # [M,9,6,6]
        return jax.vmap(jax.vmap(_min_eig))(rest[:, None] + cand_infos)

    def body(carry):
        r0, r1, j_cur, d_cur, it, _ = carry
        info_sum = (jnp.einsum("mik,mk,mjk->ij", j_cur, d_cur, j_cur)
                    + pt_sum)

        # candidate grid: slot 0 = stay (base), slots 1..8 = moves
        c0 = jnp.concatenate([r0[:, None], r0[:, None] + steps[None, :, 0]], 1)
        c1 = jnp.concatenate([r1[:, None], r1[:, None] + steps[None, :, 1]], 1)
        feas = ((c0 + c1 <= 1.0) & (c0 >= rng_lo) & (c0 <= rng_hi)
                & (c1 >= rng_lo) & (c1 <= rng_hi))
        # candidate factors ONCE per iteration; the chosen move's (j, d) are
        # selected from them below instead of a second closed-form pass
        js, ds = factors(c0, c1)                              # [M,9,6,2]
        if use_logdet:
            cand_metric = cand_metrics_logdet(info_sum, j_cur, d_cur,
                                              js, ds)         # [M,9]
        else:
            rest = info_sum[None] - info_of(j_cur, d_cur)
            cand_metric = cand_metrics_mineig(rest, js, ds)
        cand_metric = jnp.where(feas & lns.valid[:, None], cand_metric,
                                -jnp.inf)
        base = cand_metric[:, 0]
        best = jnp.argmax(cand_metric[:, 1:], axis=1) + 1
        best_m = jnp.take_along_axis(cand_metric, best[:, None], 1)[:, 0]
        take = best_m > base + 1e-12
        nr0 = jnp.where(take, jnp.take_along_axis(c0, best[:, None], 1)[:, 0], r0)
        nr1 = jnp.where(take, jnp.take_along_axis(c1, best[:, None], 1)[:, 0], r1)
        sel = best[:, None, None, None]
        nj = jnp.take_along_axis(js, sel, axis=1)[:, 0]
        nd = jnp.take_along_axis(ds, jnp.broadcast_to(
            best[:, None, None], (best.shape[0], 1, 2)), axis=1)[:, 0]
        nj = jnp.where(take[:, None, None], nj, j_cur)
        nd = jnp.where(take[:, None], nd, d_cur)
        return nr0, nr1, nj, nd, it + 1, jnp.any(take)

    # unrolled with a masked "improved" flag instead of lax.while_loop:
    # per-iteration device-loop overhead dwarfs the batched rank-4 body
    carry = (r0, r1, j0, d0, jnp.asarray(0, jnp.int32), jnp.asarray(True))
    for _ in range(max_steps):
        nxt = body(carry)
        improved = carry[5]
        carry = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old), nxt, carry)
    r0, r1, j_cur, d_cur, iters, _ = carry
    infos = info_of(j_cur, d_cur)
    info_sum = jnp.sum(infos, axis=0) + pt_sum
    return CutResult(r0=r0, r1=r1, info=infos, info_sum=info_sum, iters=iters)


def apply_cut(cam: CameraParams, lns: LineMatches, cut: CutResult
              ) -> LineMatches:
    """Rewrite matched-line endpoints by the cut ratios
    (updateEndPointByRatio, :1451-1470). Only the 3D endpoints feed the pose
    solver; projections/disparities are derived where needed."""
    sp = (1 - cut.r0)[:, None] * lns.sp3d + cut.r0[:, None] * lns.ep3d
    ep = (1 - cut.r1)[:, None] * lns.ep3d + cut.r1[:, None] * lns.sp3d
    return lns._replace(sp3d=sp, ep3d=ep)
