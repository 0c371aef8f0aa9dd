"""Distributed bundle adjustment over a device mesh.

The reference has no distributed capability (single-process C++,
SURVEY.md section 2.4); this is the TPU-native scaling path the north-star
requires: keyframe/map-block partitioned BA across chips/hosts.

Design (SURVEY.md section 7 item 7): landmarks and their observations are
sharded across the mesh axis — each device owns a block of landmarks and all
observations of those landmarks; keyframe poses are replicated. Each device:

1. assembles its landmarks' Hll blocks and their Schur reductions of the
   camera system locally,
2. ``psum``s the reduced [6K, 6K] camera system + rhs over ICI,
3. solves the (tiny) camera system replicated, and
4. back-substitutes its own landmark updates locally.

The LM loop runs inside ``shard_map`` with replicated control flow (the
psum'd error keeps every device's lambda schedule identical). Collectives
ride the mesh axis — on hardware that is ICI; under the CPU test fixture it
is the 8-device virtual mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from gfplslam_tpu.config import CameraParams
from gfplslam_tpu.models import ba as ba_ref
from gfplslam_tpu.models.ba import BAProblem, BAResult
from gfplslam_tpu.utils import se3


def make_mesh(n_devices: int | None = None, axis: str = "lm") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_problem_by_landmark(prob: BAProblem, n_shards: int) -> BAProblem:
    """Reorder + pad the problem so landmark blocks and their observations
    partition evenly into ``n_shards`` contiguous blocks (host-side, once
    per window). Observations of landmark slot i go to shard i % n_shards
    after a stable re-binning of landmark slots."""
    def pad_to(x, n):
        pad = n - x.shape[0]
        return np.pad(np.asarray(x), [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    p = prob.pt_pos.shape[0]
    l = prob.ln_sp.shape[0]
    p_pad = -(-p // n_shards) * n_shards
    l_pad = -(-l // n_shards) * n_shards
    op = prob.po_kf.shape[0]
    ol = prob.lo_kf.shape[0]
    op_pad = -(-op // n_shards) * n_shards
    ol_pad = -(-ol // n_shards) * n_shards

    # landmark slots keep their ids (block partition: slot // (p_pad/n))
    new = prob._replace(
        pt_pos=jnp.asarray(pad_to(prob.pt_pos, p_pad)),
        pt_valid=jnp.asarray(pad_to(prob.pt_valid, p_pad)),
        ln_sp=jnp.asarray(pad_to(prob.ln_sp, l_pad)),
        ln_ep=jnp.asarray(pad_to(prob.ln_ep, l_pad)),
        ln_valid=jnp.asarray(pad_to(prob.ln_valid, l_pad)),
    )

    # re-bin observations so each obs lands in its landmark's shard
    def rebin(kf, lm, payload, sigma2, valid, n_lm_pad, n_obs_pad):
        kf = np.asarray(kf)
        lm = np.asarray(lm)
        valid = np.asarray(valid)
        block = n_lm_pad // n_shards
        shard_of = np.where(valid, lm // block, n_shards)  # invalid -> tail
        # per-shard capacity sized to the LARGEST shard's load (rounded up
        # for shape stability) — a uniform n_obs_pad/n_shards split silently
        # dropped observations whenever landmark popularity was skewed,
        # making the sharded solve diverge from the dense one
        load = np.bincount(shard_of[shard_of < n_shards],
                           minlength=n_shards)
        per = max(-(-int(load.max(initial=1)) // 64) * 64,
                  n_obs_pad // n_shards)
        n_obs_pad = per * n_shards
        order = np.argsort(shard_of * n_obs_pad + np.arange(len(lm)),
                           kind="stable")
        out_idx = np.full(n_obs_pad, -1, np.int64)
        counts = np.zeros(n_shards, np.int64)
        for oi in order:
            s = shard_of[oi]
            if s >= n_shards:
                continue
            out_idx[s * per + counts[s]] = oi
            counts[s] += 1
        ok = out_idx >= 0
        safe = np.where(ok, out_idx, 0)
        return (jnp.asarray(np.where(ok, kf[safe], 0).astype(np.int32)),
                jnp.asarray(np.where(ok, lm[safe], 0).astype(np.int32)),
                jnp.asarray(np.where(ok[:, None], np.asarray(payload)[safe], 0)
                            .astype(np.float32)),
                jnp.asarray(np.where(ok, np.asarray(sigma2)[safe], 1)
                            .astype(np.float32)),
                jnp.asarray(ok & np.where(ok, valid[safe], False)))

    po = rebin(prob.po_kf, prob.po_lm, prob.po_uv, prob.po_sigma2,
               prob.po_valid, p_pad, op_pad)
    lo = rebin(prob.lo_kf, prob.lo_lm, prob.lo_le, prob.lo_sigma2,
               prob.lo_valid, l_pad, ol_pad)
    return new._replace(po_kf=po[0], po_lm=po[1], po_uv=po[2],
                        po_sigma2=po[3], po_valid=po[4],
                        lo_kf=lo[0], lo_lm=lo[1], lo_le=lo[2],
                        lo_sigma2=lo[3], lo_valid=lo[4])


@partial(jax.jit, static_argnames=("cam", "mesh", "max_iters"))
def solve_ba_sharded(cam: CameraParams, prob: BAProblem, mesh: Mesh,
                     lambda0: float = 1e-3, lambda_k: float = 10.0,
                     max_iters: int = 20) -> BAResult:
    """Landmark-sharded LM solve. ``prob`` must be pre-partitioned with
    :func:`shard_problem_by_landmark` for ``mesh`` size."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    k = prob.kf_pose.shape[0]

    lm_spec = P(axis)
    rep = P()
    in_specs = BAProblem(
        kf_pose=rep, kf_free=rep, kf_valid=rep,
        pt_pos=lm_spec, pt_valid=lm_spec,
        ln_sp=lm_spec, ln_ep=lm_spec, ln_valid=lm_spec,
        po_kf=lm_spec, po_lm=lm_spec, po_uv=lm_spec, po_sigma2=lm_spec,
        po_valid=lm_spec,
        lo_kf=lm_spec, lo_lm=lm_spec, lo_le=lm_spec, lo_sigma2=lm_spec,
        lo_valid=lm_spec)
    out_specs = BAResult(
        kf_pose=rep, pt_pos=lm_spec, ln_sp=lm_spec, ln_ep=lm_spec,
        err=rep, iters=rep, po_inlier=lm_spec, lo_inlier=lm_spec)

    p_block = prob.pt_pos.shape[0] // n
    l_block = prob.ln_sp.shape[0] // n

    def local(prob_shard: BAProblem) -> BAResult:
        # observation lm ids are global; make them shard-local
        shard = jax.lax.axis_index(axis)
        local_prob = prob_shard._replace(
            po_lm=prob_shard.po_lm - shard * p_block,
            lo_lm=prob_shard.lo_lm - shard * l_block)
        lp = local_prob

        t_cw0 = jax.vmap(se3.inverse_se3)(lp.kf_pose)

        def total_error(t_cw, pt, lsp, lep):
            rp, _, _, wp = ba_ref._point_residuals(cam, t_cw, lp, pt)
            rl, _, _, _, wl = ba_ref._line_residuals(cam, t_cw, lp, lsp, lep)
            ep = jnp.sum(jnp.where(lp.po_valid,
                                   jnp.sum(rp * rp, -1) * wp, 0.0))
            el = jnp.sum(jnp.where(lp.lo_valid,
                                   jnp.sum(rl * rl, -1) * wl, 0.0))
            cnt = jnp.sum(lp.po_valid) + jnp.sum(lp.lo_valid)
            tot = jax.lax.psum(ep + el, axis)
            cnt = jax.lax.psum(cnt, axis)
            return tot / jnp.maximum(cnt, 1)

        def step(t_cw, pt, lsp, lep, lam):
            rp, jp_pose, jp_lm, wp = ba_ref._point_residuals(cam, t_cw, lp, pt)
            rl, jl_pose, jl_sp, jl_ep, wl = ba_ref._line_residuals(
                cam, t_cw, lp, lsp, lep)
            wp = jnp.where(lp.po_valid, wp, 0.0)
            wl = jnp.where(lp.lo_valid, wl, 0.0)
            kf_opt = lp.kf_free & lp.kf_valid
            pl, ll = pt.shape[0], lsp.shape[0]

            hcc = jnp.zeros((k, 6, 6)).at[lp.po_kf].add(
                wp[:, None, None] * jnp.einsum("nri,nrj->nij", jp_pose, jp_pose))
            hcc = hcc.at[lp.lo_kf].add(
                wl[:, None, None] * jnp.einsum("nri,nrj->nij", jl_pose, jl_pose))
            bc = jnp.zeros((k, 6)).at[lp.po_kf].add(
                wp[:, None] * jnp.einsum("nri,nr->ni", jp_pose, rp))
            bc = bc.at[lp.lo_kf].add(
                wl[:, None] * jnp.einsum("nri,nr->ni", jl_pose, rl))

            hpp = jnp.zeros((pl, 3, 3)).at[lp.po_lm].add(
                wp[:, None, None] * jnp.einsum("nri,nrj->nij", jp_lm, jp_lm))
            bp = jnp.zeros((pl, 3)).at[lp.po_lm].add(
                wp[:, None] * jnp.einsum("nri,nr->ni", jp_lm, rp))
            hcl_p = jnp.zeros((pl, k, 6, 3)).at[lp.po_lm, lp.po_kf].add(
                wp[:, None, None] * jnp.einsum("nri,nrj->nij", jp_pose, jp_lm))
            jl_lm = jnp.concatenate([jl_sp, jl_ep], axis=-1)
            hll = jnp.zeros((ll, 6, 6)).at[lp.lo_lm].add(
                wl[:, None, None] * jnp.einsum("nri,nrj->nij", jl_lm, jl_lm))
            bl = jnp.zeros((ll, 6)).at[lp.lo_lm].add(
                wl[:, None] * jnp.einsum("nri,nr->ni", jl_lm, rl))
            hcl_l = jnp.zeros((ll, k, 6, 6)).at[lp.lo_lm, lp.lo_kf].add(
                wl[:, None, None] * jnp.einsum("nri,nrj->nij", jl_pose, jl_lm))

            eye3, eye6 = jnp.eye(3), jnp.eye(6)
            hpp_d = hpp + lam * jax.vmap(jnp.diag)(
                jnp.maximum(jax.vmap(jnp.diagonal)(hpp), 1e-6))
            hll_d = hll + lam * jax.vmap(jnp.diag)(
                jnp.maximum(jax.vmap(jnp.diagonal)(hll), 1e-6))
            pt_act = lp.pt_valid & (jax.vmap(jnp.trace)(hpp) > 1e-9)
            ln_act = lp.ln_valid & (jax.vmap(jnp.trace)(hll) > 1e-9)
            hpp_inv = jnp.where(pt_act[:, None, None], jnp.linalg.inv(
                jnp.where(pt_act[:, None, None], hpp_d, eye3[None])), 0.0)
            hll_inv = jnp.where(ln_act[:, None, None], jnp.linalg.inv(
                jnp.where(ln_act[:, None, None], hll_d, eye6[None])), 0.0)

            # local Schur reductions, then psum over the mesh — the ICI
            # collective that makes this scale
            s_red = (jnp.einsum("pkil,plm,pqjm->kiqj", hcl_p, hpp_inv, hcl_p)
                     + jnp.einsum("pkil,plm,pqjm->kiqj", hcl_l, hll_inv, hcl_l)
                     ).reshape(6 * k, 6 * k)
            rhs_red = (jnp.einsum("pkil,plm,pm->ki", hcl_p, hpp_inv, bp)
                       + jnp.einsum("pkil,plm,pm->ki", hcl_l, hll_inv, bl))
            s_full = jax.lax.psum(
                ba_ref._block_diag_embed(hcc) - s_red, axis)
            rhs = jax.lax.psum(bc - rhs_red, axis)

            diag_mask = jnp.repeat(kf_opt, 6)
            s_full = s_full + lam * jnp.diag(
                jnp.maximum(jnp.diagonal(s_full), 1e-6))
            s_full = jnp.where(diag_mask[:, None] & diag_mask[None, :],
                               s_full, 0.0)
            s_full = s_full + jnp.diag(jnp.where(diag_mask, 0.0, 1.0))
            rhs_f = jnp.where(diag_mask, rhs.reshape(-1), 0.0)
            dx_cam = jnp.linalg.solve(
                s_full + 1e-10 * jnp.eye(6 * k), rhs_f).reshape(k, 6)
            dx_cam = jnp.where(kf_opt[:, None], dx_cam, 0.0)

            dx_pt = jnp.einsum("plm,pm->pl", hpp_inv,
                               bp - jnp.einsum("pkil,ki->pl", hcl_p, dx_cam))
            dx_ln = jnp.einsum("plm,pm->pl", hll_inv,
                               bl - jnp.einsum("pkil,ki->pl", hcl_l, dx_cam))
            t_cw_new = jax.vmap(lambda t, d: se3.expmap_se3(-d) @ t)(
                t_cw, dx_cam)
            return (t_cw_new,
                    pt - jnp.where(pt_act[:, None], dx_pt, 0.0),
                    lsp - jnp.where(ln_act[:, None], dx_ln[:, :3], 0.0),
                    lep - jnp.where(ln_act[:, None], dx_ln[:, 3:], 0.0))

        def cond(c):
            return (c[6] < max_iters) & jnp.logical_not(c[7])

        def body(c):
            t_cw, pt, lsp, lep, lam, err, it, _ = c
            cand = step(t_cw, pt, lsp, lep, lam)
            new_err = total_error(*cand)
            improve = new_err < err
            lam2 = jnp.where(improve, lam / lambda_k, lam * lambda_k)
            out = tuple(jnp.where(improve, a, b) for a, b in
                        zip(cand, (t_cw, pt, lsp, lep)))
            err2 = jnp.where(improve, new_err, err)
            done = improve & (jnp.abs(err - new_err)
                              < 1e-9 * jnp.maximum(err, 1.0))
            return (*out, lam2, err2, it + 1, done)

        err0 = total_error(t_cw0, lp.pt_pos, lp.ln_sp, lp.ln_ep)
        t_cw, pt, lsp, lep, _, err, iters, _ = jax.lax.while_loop(
            cond, body, (t_cw0, lp.pt_pos, lp.ln_sp, lp.ln_ep,
                         jnp.asarray(lambda0), err0,
                         jnp.asarray(0, jnp.int32), jnp.asarray(False)))

        rp, _, _, _ = ba_ref._point_residuals(cam, t_cw, lp, pt)
        rl, _, _, _, _ = ba_ref._line_residuals(cam, t_cw, lp, lsp, lep)
        po_in = lp.po_valid & (jnp.sum(rp * rp, -1) * lp.po_sigma2 < 7.815)
        lo_in = lp.lo_valid & (jnp.sum(rl * rl, -1) * lp.lo_sigma2 < 7.815)
        return BAResult(kf_pose=jax.vmap(se3.inverse_se3)(t_cw), pt_pos=pt,
                        ln_sp=lsp, ln_ep=lep, err=err, iters=iters,
                        po_inlier=po_in, lo_inlier=lo_in)

    fn = shard_map(local, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs, check_vma=False)
    return fn(prob)
