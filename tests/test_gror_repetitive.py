"""GROR on repetitive structure: the lattice-alias trap (VERDICT r3 #3).

On scans with repeated structure (building facades, fence posts), wrong
matches are not random: a whole family of correspondences agrees on a
LATTICE-SHIFTED transform q = R p + t + delta.  Alias-alias pairs are then
length-consistent among themselves (the shift cancels in pairwise
distances), so they form a competing high-degree clique in GROR's
reliability graph — exactly the case where the one-candidate-edge-per-node
simplification (gror.py:406-422, vs the reference's full
enumeratePairOfCorrespondence scan, ia_gror.hpp:82-124) could lock a true
node to an alias partner and miss the optimum.  These tests pit the solver
against that structure with the alias clique nearly as large as the true
one and assert the TRUE transform wins.
"""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.models.gror import gror_solve

ANG = 0.7
R_TRUE = np.array(
    [[np.cos(ANG), -np.sin(ANG), 0], [np.sin(ANG), np.cos(ANG), 0], [0, 0, 1]],
    np.float32,
)
T_TRUE = np.array([1.2, -0.7, 0.4], np.float32)
DELTA = np.array([3.0, 0.0, 0.0], np.float32)  # lattice period (alias shift)
RES = 0.05


def _errors(T):
    dR = T[:3, :3] @ R_TRUE.T
    r_err = float(np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)))
    t_err = float(np.linalg.norm(T[:3, 3] - T_TRUE))
    return r_err, t_err


def _alias_problem(rng, n_true, n_alias, n_noise, noise=0.01):
    """Correspondence set with a true clique, a lattice-alias clique, and
    random outliers.  Alias pairs: q = R p + t + DELTA — internally
    length-consistent, inconsistent with the true clique."""
    p_true = rng.uniform(-5, 5, size=(n_true, 3)).astype(np.float32)
    q_true = p_true @ R_TRUE.T + T_TRUE + rng.normal(
        scale=noise, size=(n_true, 3)
    ).astype(np.float32)
    p_alias = rng.uniform(-5, 5, size=(n_alias, 3)).astype(np.float32)
    q_alias = p_alias @ R_TRUE.T + T_TRUE + DELTA + rng.normal(
        scale=noise, size=(n_alias, 3)
    ).astype(np.float32)
    p_noise = rng.uniform(-5, 5, size=(n_noise, 3)).astype(np.float32)
    q_noise = rng.uniform(-5, 5, size=(n_noise, 3)).astype(np.float32)
    p = np.concatenate([p_true, p_alias, p_noise])
    q = np.concatenate([q_true, q_alias, q_noise])
    perm = rng.permutation(len(p))
    return p[perm], q[perm]


def test_gror_beats_lattice_alias(rng):
    """35 true vs 33 alias supporters + 24 outliers: the optimum is the
    true clique by 2 votes, and the solver must find it exactly."""
    p, q, = _alias_problem(rng, 35, 33, 24)
    out = gror_solve(
        jnp.asarray(p), jnp.asarray(q), jnp.ones((len(p),), bool), RES
    )
    assert out["converged"], out
    r_err, t_err = _errors(np.asarray(out["transformation"]))
    assert r_err < 0.02, (r_err, out)
    assert t_err < 2 * RES, (t_err, out)
    assert out["inliers"] >= 30

def test_gror_alias_majority_of_nodes_wins_only_with_support(rng):
    """Flip the balance: the ALIAS clique is larger (40 vs 25) — GROR's
    optimum is then the alias transform.  This guards the test above from
    passing vacuously (the problem genuinely decides by support count)."""
    p, q = _alias_problem(rng, 25, 40, 16)
    out = gror_solve(
        jnp.asarray(p), jnp.asarray(q), jnp.ones((len(p),), bool), RES
    )
    assert out["converged"], out
    T = np.asarray(out["transformation"])
    t_alias = T_TRUE + DELTA
    t_err_alias = float(np.linalg.norm(T[:3, 3] - t_alias))
    assert t_err_alias < 2 * RES, (T[:3, 3], t_alias)


def test_gror_duplicate_target_edges(rng):
    """One-sided (cluster) matching can map several SOURCE keypoints onto
    one TARGET point: |q1-q2| is then EXACTLY zero for such an edge, the
    two-point alignment direction is undefined, and (pre-fix) the interval
    stab degenerated to full arcs — a spurious full-support count that
    outranked every genuine edge (found on the 4M bench: a 353-inlier
    aliased pose beat the true 1152-inlier one).  The edge-length floor
    must keep such pairs out of the alignment-edge set."""
    n_true = 60
    p_true = rng.uniform(-5, 5, size=(n_true, 3)).astype(np.float32)
    q_true = p_true @ R_TRUE.T + T_TRUE + rng.normal(
        scale=0.01, size=(n_true, 3)
    ).astype(np.float32)
    # duplicate-target rows: pairs of sources 0.4 apart sharing one target
    p_dup, q_dup = [], []
    for i in range(20):
        base = rng.uniform(-5, 5, size=3).astype(np.float32)
        tgt = rng.uniform(-5, 5, size=3).astype(np.float32)
        p_dup += [base, base + np.array([0.4, 0, 0], np.float32)]
        q_dup += [tgt, tgt]
    p = np.concatenate([p_true, np.asarray(p_dup)])
    q = np.concatenate([q_true, np.asarray(q_dup)])
    out = gror_solve(
        jnp.asarray(p), jnp.asarray(q), jnp.ones((len(p),), bool), RES
    )
    assert out["converged"], out
    r_err, t_err = _errors(np.asarray(out["transformation"]))
    assert r_err < 0.02 and t_err < 2 * RES, (r_err, t_err, out)
    assert out["inliers"] >= 55


def test_gror_full_set_degree_ranking(rng):
    """The degree pass must rank over the FULL correspondence set: with the
    true clique placed at the END of a correspondence list longer than any
    pre-cap subsample would keep, the solver still finds it (the round-3
    staged path subsampled to the first 4096 valid rows; VERDICT r3 #3)."""
    n_pad = 6000  # larger than the old ransac_compact=4096 cap
    p_noise = rng.uniform(-5, 5, size=(n_pad, 3)).astype(np.float32)
    q_noise = rng.uniform(-5, 5, size=(n_pad, 3)).astype(np.float32)
    p_true = rng.uniform(-5, 5, size=(40, 3)).astype(np.float32)
    q_true = p_true @ R_TRUE.T + T_TRUE + rng.normal(
        scale=0.01, size=(40, 3)
    ).astype(np.float32)
    # true clique strictly after the 4096th row
    p = np.concatenate([p_noise, p_true])
    q = np.concatenate([q_noise, q_true])
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        _gror_stage,
    )

    out = _gror_stage(
        jnp.asarray(p), jnp.asarray(q), jnp.ones((len(p),), bool), RES,
        FlagshipConfig(),
    )
    assert out["converged"], out
    r_err, t_err = _errors(np.asarray(out["transformation"]))
    assert r_err < 0.02 and t_err < 2 * RES, (r_err, t_err)
