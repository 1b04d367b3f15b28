"""GROR: graph-reliability based optimal registration.

Reference: vendored Wuhan-University implementation
(include/gror/ia_gror.hpp, invoked from alignment.cpp:21-35 with
K_optimal=800 and resolution = distance_thr).  Stages:

  1. node reliability: degree of each correspondence in the length-
     consistency graph |d_src - d_tgt| < 2*resolution; keep top K
     (ia_gror.hpp:126-194);
  2. edge enumeration: consistent pairs among the survivors (:82-124);
  3. for the most promising edges: two-point alignment (:418-441), a lower
     bound in the relaxed constraint space (:473-501), then the exact
     1-DoF rotation search via interval stabbing over circle-intersection
     azimuth arcs (:521-747);
  4. refinement: inliers < 2*resolution under the best transform -> Umeyama.

TPU re-design: the O(K^2) degree and edge phases are dense masked pairwise
matrices (one fused distance broadcast); the per-edge loop becomes a BATCH
of E candidate edges processed at once; interval stabbing becomes a batched
sort + prefix-scan (+1 starts / -1 ends with starts-first tie-breaks,
closed-interval semantics matching the reference sweep).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops.transform import to_matrix4, umeyama
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    AlignmentResult,
    Cloud,
    Correspondences,
)

K_OPTIMAL = 800  # alignment.cpp:31
TWO_PI = 2.0 * np.pi


@partial(jax.jit, static_argnames=("chunk",))
def _degrees_only(p, q, valid, resolution, chunk: int = 1024):
    """Degrees of the length-consistency graph WITHOUT materializing the
    [n, n] adjacency (ia_gror.hpp:126-194 computes only the counts too).
    Row-chunked: peak memory is [chunk, n] however large the
    correspondence set, so any-mode at 1M points (10^5 correspondences)
    stays well under HBM instead of allocating 2x40 GB."""
    n = p.shape[0]
    n_blocks = -(-n // chunk)
    rows = jnp.arange(n_blocks * chunk, dtype=jnp.int32).reshape(n_blocks, chunk)
    col = jnp.arange(n, dtype=jnp.int32)

    def blk(r):
        rc = jnp.clip(r, 0, n - 1)
        dp = jnp.sqrt(jnp.maximum(
            jnp.sum((p[rc][:, None, :] - p[None, :, :]) ** 2, axis=-1), 0.0
        ))
        dq = jnp.sqrt(jnp.maximum(
            jnp.sum((q[rc][:, None, :] - q[None, :, :]) ** 2, axis=-1), 0.0
        ))
        ok = (
            (jnp.abs(dp - dq) < 2.0 * resolution)
            & valid[rc][:, None]
            & valid[None, :]
            & (r[:, None] != col[None, :])
            & (r[:, None] < n)
        )
        return jnp.sum(ok, axis=1)

    return jax.lax.map(blk, rows).reshape(-1)[:n]


@partial(jax.jit, static_argnames=())
def _node_degrees(p, q, valid, resolution):
    """Degree in the length-consistency graph (ia_gror.hpp:126-194)."""
    dp = jnp.sqrt(
        jnp.maximum(jnp.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1), 0.0)
    )
    dq = jnp.sqrt(
        jnp.maximum(jnp.sum((q[:, None, :] - q[None, :, :]) ** 2, axis=-1), 0.0)
    )
    ok = (
        (jnp.abs(dp - dq) < 2.0 * resolution)
        & valid[:, None]
        & valid[None, :]
        & ~jnp.eye(p.shape[0], dtype=bool)
    )
    return jnp.sum(ok, axis=1), ok


def _two_point_align(p1, q1, p2, q2):
    """twoPairPointsAlign (ia_gror.hpp:418-441), batched over edges [E,...].

    Aligns the source edge direction onto the target edge direction
    (Rodrigues via skew matrix), translation = mean of the two endpoint
    residuals.  Returns (R [E,3,3], t [E,3], axis [E,3], origin [E,3])."""
    vs = p1 - p2
    vt = q1 - q2
    vs = vs / jnp.maximum(jnp.linalg.norm(vs, axis=-1, keepdims=True), 1e-30)
    vt = vt / jnp.maximum(jnp.linalg.norm(vt, axis=-1, keepdims=True), 1e-30)
    v = jnp.cross(vs, vt)
    c = jnp.sum(vs * vt, axis=-1)

    def skew(u):
        z = jnp.zeros_like(u[..., 0])
        return jnp.stack(
            [
                jnp.stack([z, -u[..., 2], u[..., 1]], -1),
                jnp.stack([u[..., 2], z, -u[..., 0]], -1),
                jnp.stack([-u[..., 1], u[..., 0], z], -1),
            ],
            axis=-2,
        )

    V = skew(v)
    eye = jnp.broadcast_to(jnp.eye(3), V.shape)
    denom = jnp.maximum(1.0 + c, 1e-6)[..., None, None]
    R = eye + V + (V @ V) / denom
    # antipodal edge directions (c ~ -1): rotate pi about any axis
    # perpendicular to vs.
    perp = jnp.cross(vs, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vs.shape))
    alt = jnp.cross(vs, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), vs.shape))
    pn = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    perp = jnp.where(pn > 1e-3, perp, alt)
    perp = perp / jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), 1e-30)
    R_pi = 2.0 * perp[..., :, None] * perp[..., None, :] - eye
    R = jnp.where((c < -1.0 + 1e-6)[..., None, None], R_pi, R)

    t = 0.5 * ((q1 - jnp.einsum("eij,ej->ei", R, p1, precision=jax.lax.Precision.HIGHEST)) + (q2 - jnp.einsum("eij,ej->ei", R, p2, precision=jax.lax.Precision.HIGHEST)))
    return R, t, vt, q1


@partial(jax.jit, static_argnames=())
def _rcfs_counts(R, t, axis, origin, p, q, valid, resolution):
    """Relaxed-space reliability per edge (calEdgeReliabilityInRCFS,
    ia_gror.hpp:473-501): |dist-to-origin consistency| and axis-projection
    consistency.  R,t,axis,origin: [E,...]; p,q: [M,3]."""
    diff_t = q[None, :, :] - origin[:, None, :]  # [E,M,3]
    # source-side anchor = R^-1 applied? reference: diff_to_s = s_p - first_corr_s;
    # axis_s = R^T axis_t; we reconstruct first_corr_s = R^T (origin - t).
    first_s = jnp.einsum("eji,ej->ei", R, origin - t, precision=jax.lax.Precision.HIGHEST)
    axis_s = jnp.einsum("eji,ej->ei", R, axis, precision=jax.lax.Precision.HIGHEST)
    diff_s = p[None, :, :] - first_s[:, None, :]
    dist_t = jnp.linalg.norm(diff_t, axis=-1)
    dist_s = jnp.linalg.norm(diff_s, axis=-1)
    proj_t = jnp.sum(diff_t * axis[:, None, :], axis=-1)
    proj_s = jnp.sum(diff_s * axis_s[:, None, :], axis=-1)
    ok = (
        (jnp.abs(dist_t - dist_s) < 2.0 * resolution)
        & (jnp.abs(proj_t - proj_s) < 2.0 * resolution)
        & valid[None, :]
    )
    return jnp.sum(ok, axis=1)


@partial(jax.jit, static_argnames=())
def _tcfs_stab(R, t, axis, origin, p, q, valid, resolution):
    """Tight-space reliability: batched interval stabbing over azimuth arcs
    (calEdgeReliabilityInTCFS + intervalStab, ia_gror.hpp:521-747).

    Returns (best_angle [E], best_count [E])."""
    E = R.shape[0]
    M = p.shape[0]
    thr = 2.0 * resolution

    # rotate both point sets into the axis-aligned frame: z == rot axis
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), axis.shape)
    v = jnp.cross(axis, z)
    c = jnp.sum(axis * z, axis=-1)

    def skew(u):
        zz = jnp.zeros_like(u[..., 0])
        return jnp.stack(
            [
                jnp.stack([zz, -u[..., 2], u[..., 1]], -1),
                jnp.stack([u[..., 2], zz, -u[..., 0]], -1),
                jnp.stack([-u[..., 1], u[..., 0], zz], -1),
            ],
            axis=-2,
        )

    V = skew(v)
    eye = jnp.broadcast_to(jnp.eye(3), V.shape)
    W = eye + V + (V @ V) / jnp.maximum(1.0 + c, 1e-6)[..., None, None]
    flipz = jnp.broadcast_to(jnp.diag(jnp.array([1.0, -1.0, -1.0])), V.shape)
    W = jnp.where((c < -1.0 + 1e-6)[..., None, None], flipz, W)

    # local target coords: W (q - origin); local source: W (R p + t - origin)
    tq = jnp.einsum("eij,emj->emi", W, q[None, :, :] - origin[:, None, :], precision=jax.lax.Precision.HIGHEST)
    sp = jnp.einsum("eij,mj->emi", R, p, precision=jax.lax.Precision.HIGHEST) + t[:, None, :] - origin[:, None, :]
    sp = jnp.einsum("eij,emj->emi", W, sp, precision=jax.lax.Precision.HIGHEST)

    def cyl(x):
        length = jnp.sqrt(jnp.maximum(x[..., 0] ** 2 + x[..., 1] ** 2, 0.0))
        azi = jnp.arctan2(x[..., 1], x[..., 0])
        return length, x[..., 2], azi

    m_len, m_z, m_azi = cyl(sp)
    b_len, b_z, b_azi = cyl(tq)

    dz = b_z - m_z
    d = b_len - m_len
    th_mz = thr * thr - dz * dz
    feasible = (d * d <= th_mz) & valid[None, :]
    rth = jnp.sqrt(jnp.maximum(th_mz, 0.0))

    # circle intersection half-angle (circleIntersection, ia_gror.hpp:521-552)
    Rr = jnp.maximum(m_len, 1e-12)
    dd = jnp.maximum(b_len, 0.0)
    x = (dd * dd - rth * rth + Rr * Rr) / (2.0 * jnp.maximum(dd, 1e-12))
    rat = x / Rr
    dev = jnp.where(
        (dd <= 1e-7) | (rat <= -1.0), jnp.pi, jnp.arccos(jnp.clip(rat, -1.0, 1.0))
    )
    full = (m_len <= 1e-7) | (jnp.abs(dev - jnp.pi) <= 1e-7)

    center = jnp.mod(b_azi - m_azi + TWO_PI, TWO_PI)
    beg = jnp.mod(center - dev + TWO_PI, TWO_PI)
    end = jnp.mod(center + dev + TWO_PI, TWO_PI)
    beg = jnp.where(full, 0.0, beg)
    end = jnp.where(full, TWO_PI, end)
    # wrapped arcs split into [beg, 2pi] + [0, end]
    wrap = end < beg
    big = jnp.float32(1e9)

    # events: 2 intervals per correspondence -> 4 endpoints
    s1 = jnp.where(feasible, jnp.where(wrap, beg, beg), big)
    e1 = jnp.where(feasible, jnp.where(wrap, TWO_PI, end), big)
    s2 = jnp.where(feasible & wrap, 0.0, big)
    e2 = jnp.where(feasible & wrap, end, big)

    starts = jnp.concatenate([s1, s2], axis=1)  # [E, 2M]
    ends = jnp.concatenate([e1, e2], axis=1)
    locs = jnp.concatenate([starts, ends], axis=1)  # [E, 4M]
    deltas = jnp.concatenate(
        [jnp.ones((E, 2 * M)), -jnp.ones((E, 2 * M))], axis=1
    )
    # sort by (loc, ENDS first).  The tie-break must reorder ONLY exact
    # ties: all locations are non-negative f32, whose IEEE bit patterns
    # bitcast to int32 monotonically, so (bits << 1) | is_start is an exact
    # lexicographic key.  (A float key `loc*2 - is_start` is WRONG: the
    # offset 1 drags every start up to 0.5 rad early, so intervals that
    # already ended stay counted — measured a spurious count of 85 at a
    # wrong angle vs the true optimum 84 on a zero-noise 120-pair edge.)
    # Ends sort BEFORE starts at exact ties because the returned angle is
    # the OPEN-GAP midpoint below: an interval ending exactly at the best
    # start's location is not active there, so counting it (starts-first)
    # would inflate best_count vs the count the angle realizes.  Endpoint
    # angles put the pair exactly ON the 2*resolution threshold, which the
    # downstream strict `d < 2*resolution` test rejects anyway — the
    # open-interval stab is the consistent semantics end-to-end.
    ibits = jax.lax.bitcast_convert_type(locs, jnp.uint32)
    keys = (ibits << 1) | (deltas > 0).astype(jnp.uint32)  # uint32: the
    # largest pattern (big=1e9 -> 0x4E6E6B28) shifted left still fits
    order = jnp.argsort(keys, axis=1)
    sl = jnp.take_along_axis(locs, order, axis=1)
    sd = jnp.take_along_axis(deltas, order, axis=1)
    sd = jnp.where(sl >= big, 0.0, sd)
    run = jnp.cumsum(sd, axis=1)
    run_at_start = jnp.where((sd > 0) & (sl < big), run, -jnp.inf)
    best_idx = jnp.argmax(run_at_start, axis=1)
    best_count = jnp.max(run_at_start, axis=1)
    # the stab angle is the MIDPOINT between the best start event and the
    # next strictly-greater event location, which is strictly inside every
    # stabbed closed interval.  Documented deviation: the reference's USED
    # intervalStab variant (one_to_one=true, ia_gror.hpp:744,595-616) keeps
    # the start-event location itself; its one_to_one=false branch midpoints
    # exactly like this (:584-588).  The boundary location puts noise-free
    # inliers exactly ON the threshold, where the downstream refine test
    # d < 2*resolution rejects every one of them (measured: a zero-noise
    # 120-pair problem refined to 3 inliers and failed to converge) — the
    # midpoint matches the author's own non-degenerate intent at no cost.
    li = jnp.take_along_axis(sl, best_idx[:, None], axis=1)  # [E, 1]
    gt = jnp.where((sl > li) & (sl < big), sl, jnp.inf)
    nxt = jnp.min(gt, axis=1)  # next greater event location (or inf)
    best_angle = jnp.where(
        jnp.isfinite(nxt), 0.5 * (li[:, 0] + nxt), li[:, 0]
    )
    best_count = jnp.where(jnp.isfinite(best_count), best_count, 0.0)
    return best_angle, best_count.astype(jnp.int32)


def _axis_rotation(axis, angle):
    """Rodrigues rotation about `axis` by `angle` (batched)."""
    a = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    zz = jnp.zeros_like(a[..., 0])
    K = jnp.stack(
        [
            jnp.stack([zz, -a[..., 2], a[..., 1]], -1),
            jnp.stack([a[..., 2], zz, -a[..., 0]], -1),
            jnp.stack([-a[..., 1], a[..., 0], zz], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    outer = a[..., :, None] * a[..., None, :]
    return c * eye + s * K + (1.0 - c) * outer


MIN_EDGE_ADJACENCY = 10  # ia_gror.hpp:205-207: skip edges with <10 pairs


def _edge_search(p, q, valid, resolution, i1, i2, edge_batch: int,
                 e_valid=None):
    """Exact optimal edge search over the candidate edges (i1, i2).

    Batched two-point alignment + RCFS lower bounds for every edge at once,
    then TCFS interval stabbing in descending-RCFS rounds of `edge_batch`
    with a host early-exit once best_tcfs >= max remaining RCFS.  Because
    RCFS counts upper-bound TCFS counts edge-for-edge (the relaxed space
    drops the azimuth constraint), the early exit preserves exact optimality
    over the edge set — same guarantee as the reference's full scan with its
    `der_in_rcfs <= best_count_` prune (ia_gror.hpp:230-236).

    `e_valid` (host bool [E] or None) marks padding edges: callers that pad
    (i1, i2) to a FIXED length for compile-shape stability mask the padding
    here; masked edges get RCFS -1, so they sort last and can never win.

    Returns (best_e, best_count, best_angle, rounds, R, t, axis, origin)."""
    R, t, axis, origin = _two_point_align(p[i1], q[i1], p[i2], q[i2])
    rc_np = np.asarray(_rcfs_counts(R, t, axis, origin, p, q, valid, resolution))
    if e_valid is not None:
        rc_np = np.where(np.asarray(e_valid), rc_np, -1)

    e_order = np.argsort(-rc_np, kind="stable")
    best_count = 0
    best_e = -1
    best_angle_v = 0.0
    rounds = 0
    for s in range(0, len(e_order), edge_batch):
        chunk = e_order[s : s + edge_batch]
        if rc_np[chunk[0]] <= best_count:
            break  # RCFS >= TCFS: nothing left can beat the best
        sel = np.full((edge_batch,), chunk[0], np.int64)
        sel[: len(chunk)] = chunk
        selj = jnp.asarray(sel)
        angles, counts = _tcfs_stab(
            R[selj], t[selj], axis[selj], origin[selj], p, q, valid, resolution
        )
        counts_np = np.asarray(counts)[: len(chunk)]
        counts_np = np.where(rc_np[chunk] < 0, -1, counts_np)
        rounds += 1
        ci = int(np.argmax(counts_np))
        if int(counts_np[ci]) > best_count:
            best_count = int(counts_np[ci])
            best_e = int(chunk[ci])
            best_angle_v = float(np.asarray(angles)[ci])
    return best_e, best_count, best_angle_v, rounds, R, t, axis, origin


def gror_solve(
    p_all,
    q_all,
    valid,
    resolution: float,
    k_optimal: int = K_OPTIMAL,
    edge_batch: int = 256,
) -> dict:
    """GROR over matched point pairs — the solver core, shape-stable.

    Takes the correspondence ENDPOINTS directly (p_all/q_all [P,3] with a
    validity mask), so the staged TPU path can run GROR on its compacted
    correspondence set with the same call shape every repeat: the top-K
    node set is padded to a FIXED min(k_optimal, P) rows and the candidate
    edge list to one fixed row per node, so the jitted inner programs
    (_degrees_only / _node_degrees / _two_point_align / _rcfs_counts /
    _tcfs_stab) compile once per P, never per realized correspondence
    count.  Algorithm and gates are align_gror's (ia_gror.hpp:126-365).

    Returns the staged-solver result dict (same keys as
    flagship.ransac_solve), all host values."""
    P = int(p_all.shape[0])
    valid_np = np.asarray(valid).astype(bool)
    n_corr = int(valid_np.sum())
    identity = np.eye(4, dtype=np.float32)
    fail = {
        "transformation": identity,
        "metric": 0.0,
        "inliers": 0,
        "converged": False,
        "n_correspondences": n_corr,
        "iterations": 0,
    }
    if n_corr < 2:
        return fail

    # 1. node reliability, keep top K among nodes with >=1 consistent pair
    # (chunked: only the degrees are needed here, never the [P, P] graph)
    deg_np = np.asarray(_degrees_only(p_all, q_all, valid, resolution))
    deg_np = np.where(valid_np, deg_np, 0)
    k_pad = int(min(k_optimal, P))
    order = np.argsort(-deg_np, kind="stable")[:k_pad]
    node_ok = deg_np[order] > 0
    if int(node_ok.sum()) < 2:
        return fail
    keep = jnp.asarray(order)
    p = p_all[keep]
    q = q_all[keep]
    vk = jnp.asarray(node_ok)

    # 2. edge enumeration among survivors (ia_gror.hpp:82-124): one edge per
    # node i with j>i adjacency size >= 10; the partner is the highest-degree
    # consistent j>i (the reference takes the first by index, :209 — the
    # best-degree partner dominates it for reliability at equal cost).
    # Fixed [k_pad] edge rows; non-qualifying nodes ride as masked padding.
    _deg2, adj2 = _node_degrees(p, q, vk, resolution)
    adj_np = np.asarray(adj2)
    upper = np.triu(adj_np, 1)
    adj_size = upper.sum(1)
    deg_full = adj_np.sum(1)
    # Edge-length floor for the ALIGNMENT pair (not for the consistency
    # counts): a near-zero edge on EITHER side degenerates the two-point
    # alignment — with one-sided (cluster) matching two source keypoints
    # can share one target point, making |q1-q2| EXACTLY zero; the edge
    # direction is then undefined and the interval stab degenerates to
    # full arcs, reporting a spurious full-support count that argmax
    # prefers over genuine edges (measured at 4M: a 353-inlier aliased
    # pose beat the true 1152-inlier one).  Edges shorter than the 2*res
    # consistency band cannot constrain direction better than ~90 deg.
    p_np_k = np.asarray(p)
    q_np_k = np.asarray(q)
    dps = np.linalg.norm(p_np_k[:, None, :] - p_np_k[None, :, :], axis=-1)
    dqs = np.linalg.norm(q_np_k[:, None, :] - q_np_k[None, :, :], axis=-1)
    floor = 2.0 * resolution
    sel_ok = (upper > 0) & (dps > floor) & (dqs > floor)
    e_valid = (adj_size >= MIN_EDGE_ADJACENCY) & sel_ok.any(axis=1)
    if not e_valid.any():
        return fail
    partner_score = np.where(sel_ok, deg_full[None, :], -1)
    partners = np.argmax(partner_score, axis=1)
    i1 = jnp.arange(k_pad, dtype=jnp.int32)
    i2 = jnp.asarray(partners.astype(np.int32))

    best_e, best_count, best_angle_v, rounds, R, t, axis, origin = _edge_search(
        p, q, vk, resolution, i1, i2, edge_batch, e_valid=e_valid
    )
    if best_e < 0:
        return fail

    Rb = R[best_e]
    tb = t[best_e]
    rot = _axis_rotation(axis[best_e], jnp.float32(best_angle_v))
    # compose: translate to origin, rotate about axis, translate back
    Rf = jnp.matmul(rot, Rb, precision=jax.lax.Precision.HIGHEST)
    tf = rot @ (tb - origin[best_e]) + origin[best_e]

    # 4. refine: inliers < 2*resolution over ALL input correspondences ->
    # Umeyama (ia_gror.hpp:261-365)
    p_np = np.asarray(p_all)
    q_np = np.asarray(q_all)
    Tp = np.eye(4, dtype=np.float32)
    Tp[:3, :3] = np.asarray(Rf)
    Tp[:3, 3] = np.asarray(tf)
    moved = p_np @ np.asarray(Rf).T + np.asarray(tf)
    d = np.linalg.norm(q_np - moved, axis=1)
    inl = (d < 2.0 * resolution) & valid_np
    n_inl = int(inl.sum())
    if n_inl >= 3:
        w = jnp.asarray(inl.astype(np.float32))
        Ru, tu = umeyama(p_all[None], q_all[None], w[None])
        T = np.asarray(to_matrix4(Ru[0], tu[0]))
        # re-count under the refined transform for the convergence gate
        moved2 = p_np @ T[:3, :3].T + T[:3, 3]
        d2 = np.linalg.norm(q_np - moved2, axis=1)
        inl = (d2 < 2.0 * resolution) & valid_np
        n_inl = int(inl.sum())
    else:
        T = Tp
    # converged gate on the refined inlier support (the edge qualification
    # floor): a lone degenerate edge can no longer report success
    converged = bool(
        n_inl >= MIN_EDGE_ADJACENCY and best_count >= MIN_EDGE_ADJACENCY
    )
    return {
        "transformation": T.astype(np.float32),
        "metric": float(n_inl),
        "inliers": n_inl,
        "converged": converged,
        "n_correspondences": n_corr,
        "iterations": rounds,
    }


def align_gror(
    src: Cloud,
    tgt: Cloud,
    corrs: Correspondences,
    params: AlignmentParameters,
    k_optimal: int = K_OPTIMAL,
    edge_batch: int = 256,
) -> AlignmentResult:
    """Optimal edge search, TPU-batched.

    The reference (ia_gror.hpp:199-258) scans every node's first-partner
    edge sorted by adjacency size, pruning with the relaxed-space (RCFS)
    count against the running best before the exact interval stab (TCFS).
    Here: two-point alignment + RCFS are batched over ALL qualifying edges
    at once, edges are visited in descending-RCFS rounds of `edge_batch`,
    and the search stops when the best TCFS count >= the max remaining RCFS
    count.  Since RCFS upper-bounds TCFS for the same edge, this terminates
    with the exact optimum over the candidate edge set — the same guarantee
    as the reference scan, reached in far fewer TCFS evaluations."""
    t0 = time.time()
    corrs = corrs.compact()
    n = int(np.asarray(corrs.count()))
    identity = np.eye(4, dtype=np.float32)
    if n < 2:
        return AlignmentResult(
            src=src, tgt=tgt, transformation=identity, correspondences=corrs,
            iterations=1, converged=False, time_te=time.time() - t0,
        )

    out = gror_solve(
        src.xyz[corrs.query],
        tgt.xyz[corrs.match],
        corrs.valid,
        float(params.distance_thr),
        k_optimal=k_optimal,
        edge_batch=edge_batch,
    )
    return AlignmentResult(
        src=src,
        tgt=tgt,
        transformation=out["transformation"],
        correspondences=corrs,
        iterations=max(int(out["iterations"]), 1),
        converged=bool(out["converged"]),
        time_te=time.time() - t0,
        metric=float(out["metric"]),
    )


def gror_preparation(
    src: Cloud,
    tgt: Cloud,
    resolution: float,
    n_optimal: int = K_OPTIMAL,
):
    """GROR's own preprocessing pipeline (reference: src/gror/gror_pre.cpp
    grorPreparation — voxel downsample, ISS keypoints, FPFH, mutual-kNN
    correspondences with the canonical radii: normals 3x resolution, FPFH
    8x resolution).  The main alignment path feeds GROR from the framework's
    matcher instead (alignment.cpp:21-35), exactly like the reference; this
    helper exists for standalone GROR use.

    Returns (corrs, kp_idx_src, kp_idx_tgt)."""
    import jax.numpy as jnp

    from lidar_global_registration_tpu.ops.downsample import voxel_downsample
    from lidar_global_registration_tpu.ops.fpfh import fpfh
    from lidar_global_registration_tpu.ops.iss import detect_keypoints
    from lidar_global_registration_tpu.ops.matchers import match_bf
    from lidar_global_registration_tpu.ops.normals import estimate_normals_knn

    def side(cloud):
        down = voxel_downsample(cloud, resolution).compact()
        down = estimate_normals_knn(down, k=30)
        kp = detect_keypoints(down, "iss", 2.0 * resolution)
        return down, kp

    src_d, kp_s = side(src)
    tgt_d, kp_t = side(tgt)

    def feats(cloud, kp):
        kx = cloud.xyz[jnp.asarray(kp.astype(np.int64))]
        kv = jnp.ones((len(kp),), bool)
        kn = cloud.normal[jnp.asarray(kp.astype(np.int64))]
        return fpfh(
            kx, kv, cloud.xyz, cloud.normal, cloud.valid, 8.0 * resolution,
            kp_normal=kn,
        )

    fs, vs = feats(src_d, kp_s)
    ft, vt = feats(tgt_d, kp_t)
    i_st, d_st, m_st = match_bf(fs, ft, vs, vt, k=1)
    i_ts, _d, m_ts = match_bf(ft, fs, vt, vs, k=1)
    j = np.asarray(i_st[:, 0])
    mutual = (
        np.asarray(m_st[:, 0])
        & np.asarray(m_ts[:, 0])[j]
        & (np.asarray(i_ts[:, 0])[j] == np.arange(len(kp_s)))
    )
    rows = np.nonzero(mutual)[0]
    from lidar_global_registration_tpu.types import round_up
    import jax.numpy as jnp2

    cap = round_up(max(len(rows), 1))
    q = np.zeros(cap, np.int32)
    m = np.zeros(cap, np.int32)
    dd = np.zeros(cap, np.float32)
    th = np.full(cap, 2.0 * resolution, np.float32)
    vv = np.zeros(cap, bool)
    q[: len(rows)] = kp_s[rows]
    m[: len(rows)] = kp_t[j[rows]]
    dd[: len(rows)] = np.asarray(d_st[:, 0])[rows]
    vv[: len(rows)] = True
    corrs = Correspondences(
        query=jnp2.asarray(q), match=jnp2.asarray(m), distance=jnp2.asarray(dd),
        threshold=jnp2.asarray(th), valid=jnp2.asarray(vv),
    )
    return (src_d, tgt_d, corrs)
