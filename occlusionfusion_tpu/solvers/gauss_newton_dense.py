"""Dense-normal-equations Gauss-Newton: JtJ block assembly on the MXU.

The matrix-free GN-CG solver (gauss_newton.py) and the reference's Adam
loop are both *latency-bound* on TPU: hundreds of dependent small ops per
solve (measured ~1.6 ms per Adam iteration for 4k points / 256 nodes —
170 ms per 100-iteration solve). This solver is the SURVEY §7 "K3"
design: per-residual 6-dof jacobian blocks are computed analytically and
contracted into the dense [6N, 6N] normal matrix with ONE big einsum +
scatter-add (MXU work), then solved by Cholesky — a handful of large ops
per GN iteration instead of a long dependent chain.

Analytic linearization at the current estimate (dw = 0):
  point residual  r_p = sum_k w_k (R_k (x_p - g_k) + g_k + t_k) - y_p
    d r_p / d dw_k = -w_k [R_k (x_p - g_k)]_x      (cross matrix)
    d r_p / d t_k  =  w_k I
  ARAP edge (i, j) r_e = R_i (g_j - g_i) + g_i + t_i - g_j - t_j
    d/d dw_i = -[R_i (g_j - g_i)]_x ; d/d t_i = I ; d/d t_j = -I
  motion prior     r_n = c_n (g_n + t_n - m_n):  d/d t_n = c_n I

Same GNProblem/GNResult interface as gauss_newton.py; the two solvers
cross-validate each other in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.so3 import hat, so3_exp
from occlusionfusion_tpu.geometry.edwarp import ed_warp
from occlusionfusion_tpu.solvers.gauss_newton import (
    GNConfig,
    GNProblem,
    GNResult,
    data_residual_rows,
    projection_row_scaling,
)


def _assemble(problem: GNProblem, config: GNConfig, R, t):
    """Build (M [6N, 6N], b [6N] = J^T r, sq_residual) at the current
    estimate. Column layout is node-major with the 6 dofs inner.

    MXU formulation: the sparse per-residual jacobian blocks are
    scattered into ONE dense row-stacked jacobian (point + ARAP + motion
    rows) with one-hot anchor matmuls (iota compare -> einsum), and
    M = J^T J / b = J^T r are a single pair of large matmuls — the
    shortest dependent-op chain per GN iteration (each extra einsum was
    ~0.3-0.5 ms of relay/HBM latency at the 128-node cap)."""
    n = problem.nodes.shape[0]
    P, K = problem.point_anchors.shape

    # ---- point rows [3P, 6N]
    x = problem.source_points
    g = problem.nodes[problem.point_anchors]  # [P, K, 3]
    Rk = R[problem.point_anchors]  # [P, K, 3, 3]
    tk = t[problem.point_anchors]
    local = jnp.einsum(
        "pkij,pkj->pki", Rk, x[:, None] - g, precision="highest"
    )  # R_k (x - g_k)
    w = problem.point_weights * problem.point_valid[:, None]  # [P, K]
    sw = jnp.sqrt(jnp.asarray(config.w_point, jnp.float32))
    warped = jnp.sum(
        problem.point_weights[..., None] * (local + g + tk), axis=1
    )
    r_pt = data_residual_rows(warped, problem, config)

    # jacobian blocks [P, K, 3, 6]: [-w hat(local) | w I]
    Jw = -hat(local) * w[..., None, None]  # [P, K, 3, 3]
    Jt = (
        jnp.broadcast_to(jnp.eye(3), (P, K, 3, 3)) * w[..., None, None]
    )
    J = sw * jnp.concatenate([Jw, Jt], axis=-1)  # [P, K, 3, 6]
    G = projection_row_scaling(warped, problem, config)
    if G is not None:
        J = jnp.einsum("pab,pkbc->pkac", G, J, precision="highest")

    # dense jacobian rows via one-hot anchors: [P, 3, N, 6] -> [3P, 6N]
    iota = jnp.arange(n, dtype=problem.point_anchors.dtype)
    onehot = (
        problem.point_anchors[:, :, None] == iota[None, None]
    ).astype(jnp.float32)  # [P, K, N]
    J_pt = jnp.einsum(
        "pkac,pkn->panc", J, onehot, precision="highest"
    ).reshape(3 * P, 6 * n)

    # ---- ARAP rows [N*Ke*3, 6N]
    E_k = problem.edges.shape[1]
    e = jnp.maximum(problem.edges, 0)
    g_i = problem.nodes[:, None]
    g_j = problem.nodes[e]
    rot = jnp.einsum(
        "nij,nkj->nki", R, g_j - g_i, precision="highest"
    )  # [N, Ke, 3]
    r_arap = rot + g_i + t[:, None] - g_j - t[e]
    wa = jnp.sqrt(
        jnp.asarray(config.w_arap, jnp.float32)
        * jnp.where(problem.edges >= 0, problem.edge_weights, 0.0)
    )  # [N, Ke]
    r_arap = wa[..., None] * r_arap
    # blocks for unknowns i (rot+trans) and j (trans only)
    Ji = jnp.concatenate(
        [
            -hat(rot),
            jnp.broadcast_to(jnp.eye(3), (n, E_k, 3, 3)),
        ],
        axis=-1,
    ) * wa[..., None, None]  # [N, Ke, 3, 6]
    Jj = jnp.concatenate(
        [
            jnp.zeros((n, E_k, 3, 3)),
            -jnp.broadcast_to(jnp.eye(3), (n, E_k, 3, 3)),
        ],
        axis=-1,
    ) * wa[..., None, None]
    onehot_i = jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float32)[:, None], (n, E_k, n)
    )
    onehot_j = (e[:, :, None] == iota[None, None]).astype(jnp.float32)
    # rows stay per-EDGE, not per-node — J^T J of summed per-node rows
    # would add spurious cross-edge terms. Shape [N*Ke*3, 6N].
    J_arap = (
        jnp.einsum("neac,nem->neamc", Ji, onehot_i, precision="highest")
        + jnp.einsum("neac,nem->neamc", Jj, onehot_j, precision="highest")
    ).reshape(n * E_k * 3, 6 * n)

    rows = [J_pt, J_arap]
    residuals = [r_pt.reshape(-1), r_arap.reshape(-1)]

    # ---- motion-prior rows [3N, 6N] (translation entries only)
    if config.w_motion:
        wm = jnp.sqrt(
            jnp.asarray(config.w_motion, jnp.float32)
        ) * problem.motion_confidence * problem.node_valid
        r_m = wm[:, None] * (problem.nodes + t - problem.motion_targets)
        idx = jnp.arange(n)
        J_m = jnp.zeros((n, 3, n, 6)).at[idx, :, idx, 3:].set(
            jnp.eye(3) * wm[:, None, None]
        ).reshape(3 * n, 6 * n)
        rows.append(J_m)
        residuals.append(r_m.reshape(-1))

    J_all = jnp.concatenate(rows, axis=0)
    r_all = jnp.concatenate(residuals, axis=0)
    M = jnp.einsum(
        "ra,rb->ab", J_all, J_all, precision=config.normal_matrix_precision
    )
    b = jnp.einsum("ra,r->a", J_all, r_all, precision="highest")
    sq = jnp.sum(r_all * r_all)
    return M, b, sq


class PairScatterPlan(NamedTuple):
    """Keyframe-static plan for the block-table scatter.

    The (anchor, anchor) / (node, edge) pair segments of the dense-GN
    assembly depend only on the skin/edge tables, which are fixed
    between keyframe graph rebuilds — but the unsorted segment_sum into
    the full [N*N] block table costs ~1.9 ms/iter at the 512 cap while
    the occupied pairs are ~5-10% of N^2 (skinning is local). The plan
    remaps every scatter row to a COMPACT pair slot (measured ~1.0 ms)
    once per keyframe; each GN iteration then scatter-adds into the
    compact table and expands it to [N*N] with one small scatter-set.

    ``overflow`` flags more unique pairs than ``slot_segs`` has slots
    (pathological graphs); the assembly then falls back to the direct
    full-space scatter via lax.cond, so the plan is always safe.
    """

    compact_ids: jnp.ndarray  # [R] int32 row -> compact slot
    slot_segs: jnp.ndarray  # [U] int32 slot -> N*N segment (n*n = unused)
    overflow: jnp.ndarray  # [] bool


def pair_segment_ids(point_anchors, edges, n):
    """All scatter segment ids of ``_assemble_blocks`` in row order:
    [point K^2 pairs | arap ij | arap ji | arap jj]."""
    a = point_anchors.astype(jnp.int32)
    e = jnp.maximum(edges, 0).astype(jnp.int32)
    E_k = edges.shape[1]
    seg_pt = (a[:, :, None] * n + a[:, None, :]).reshape(-1)
    idx_i = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, E_k)
    )
    seg_ij = (idx_i * n + e).reshape(-1)
    seg_ji = (e * n + idx_i).reshape(-1)
    seg_jj = (e * n + e).reshape(-1)
    return jnp.concatenate([seg_pt, seg_ij, seg_ji, seg_jj])


@functools.partial(jax.jit, static_argnames=("n", "u_cap"))
def build_pair_scatter_plan(
    point_anchors, edges, n: int, u_cap: int = 0
) -> PairScatterPlan:
    """Build the compact-pair plan (jittable; runs once per keyframe).

    ``u_cap`` 0 derives min(n*n, 64*n) — generous for 4-NN skinning
    locality; overflow falls back to the direct scatter at solve time.
    """
    if u_cap <= 0:
        u_cap = min(n * n, 64 * n)
    segs = pair_segment_ids(point_anchors, edges, n)
    order = jnp.argsort(segs)
    s_sorted = segs[order]
    newseg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (s_sorted[1:] != s_sorted[:-1]).astype(jnp.int32)]
    )
    rank = jnp.cumsum(newseg) - 1  # compact slot per sorted row
    n_unique = rank[-1] + 1
    overflow = n_unique > u_cap
    rank_c = jnp.minimum(rank, u_cap - 1)
    compact_ids = jnp.zeros_like(segs).at[order].set(rank_c)
    slot_segs = jnp.full((u_cap,), n * n, jnp.int32).at[rank_c].set(
        s_sorted
    )
    return PairScatterPlan(
        compact_ids=compact_ids, slot_segs=slot_segs, overflow=overflow
    )


def _resolve_assembly(config: GNConfig) -> str:
    """'auto' -> Pallas fused assembly on TPU, XLA blocks elsewhere
    (Pallas interpret mode on CPU is orders of magnitude slower). The
    Pallas point-term kernel hard-codes the point3d rows, so the
    2d_depth data term always takes the XLA blocks path."""
    if config.data_term == "2d_depth" and config.assembly in (
        "auto", "blocks_pallas",
    ):
        return "blocks"
    if config.assembly == "auto":
        return (
            "blocks_pallas"
            if jax.default_backend() == "tpu"
            else "blocks"
        )
    return config.assembly


def _assemble_blocks(problem: GNProblem, config: GNConfig, R, t,
                     plan: PairScatterPlan | None = None):
    """Block-scatter assembly: mathematically identical to ``_assemble``
    but never materializes the dense row-stacked jacobian. Each residual
    contributes 6x6 blocks at its (anchor, anchor) pairs, accumulated
    with segment_sum into the [N, N] block table.

    The dense-J route computes J^T J over a [rows, 6N] matrix that is
    ~99% zeros — at the 512-node cap that is ~490 GFLOP of mostly-zero
    MXU work per GN iteration (measured 113-166 ms per 4-iter solve,
    assembly-bound: CG-12 == CG-24 there). The true block FLOPs are
    ~10^3x smaller; this path pays one scatter-add instead."""
    n = problem.nodes.shape[0]
    P, K = problem.point_anchors.shape

    # ---- point term (identical jacobian blocks to _assemble)
    assembly = _resolve_assembly(config)
    sw = jnp.sqrt(jnp.asarray(config.w_point, jnp.float32))
    if assembly.startswith("blocks_pallas") and K == 4:
        # fused Pallas kernel: jacobian build + pair blocks + rhs +
        # residual in one pass (ops/gn_assembly.py); the XLA branch
        # below is its cross-validated twin
        import math

        from occlusionfusion_tpu.ops.gn_assembly import (
            point_term_blocks_pallas,
        )

        blk16, b_pt, rsq = point_term_blocks_pallas(
            problem.source_points,
            problem.target_points,
            problem.point_valid,
            problem.point_anchors,
            problem.point_weights,
            problem.nodes,
            R,
            t,
            sw=math.sqrt(float(config.w_point)),
        )
        blk = blk16.reshape(P, K, K, 6, 6)
        sq = jnp.sum(rsq)
    else:
        x = problem.source_points
        g = problem.nodes[problem.point_anchors]
        Rk = R[problem.point_anchors]
        tk = t[problem.point_anchors]
        local = jnp.einsum(
            "pkij,pkj->pki", Rk, x[:, None] - g, precision="highest"
        )
        w = problem.point_weights * problem.point_valid[:, None]
        warped = jnp.sum(
            problem.point_weights[..., None] * (local + g + tk), axis=1
        )
        r_pt = data_residual_rows(warped, problem, config)
        Jw = -hat(local) * w[..., None, None]
        Jt = jnp.broadcast_to(jnp.eye(3), (P, K, 3, 3)) * w[..., None, None]
        J = sw * jnp.concatenate([Jw, Jt], axis=-1)  # [P, K, 3, 6]
        G = projection_row_scaling(warped, problem, config)
        if G is not None:
            J = jnp.einsum("pab,pkbc->pkac", G, J, precision="highest")

        blk = jnp.einsum(
            "pkai,plaj->pklij", J, J,
            precision=config.normal_matrix_precision,
        )  # [P, K, K, 6, 6]
        b_pt = jnp.einsum("pkai,pa->pki", J, r_pt, precision="highest")
        sq = jnp.sum(r_pt * r_pt)
    a = problem.point_anchors.astype(jnp.int32)

    # ---- ARAP term
    E_k = problem.edges.shape[1]
    e = jnp.maximum(problem.edges, 0).astype(jnp.int32)
    wa = jnp.sqrt(
        jnp.asarray(config.w_arap, jnp.float32)
        * jnp.where(problem.edges >= 0, problem.edge_weights, 0.0)
    )
    # NB: the fused ARAP kernel measured slightly SLOWER than the XLA
    # ARAP ops inside the full solve at cap 512 (34.4 vs 32.7 ms per
    # 4-iter solve) — the edge term is tiny (N*Ke rows vs P*K^2) and XLA
    # overlaps its small einsums well, so "blocks_pallas" (the auto
    # choice) fuses only the point term; "blocks_pallas_full" keeps the
    # ARAP kernel selectable for larger edge budgets.
    if assembly == "blocks_pallas_full":
        from occlusionfusion_tpu.ops.gn_assembly import (
            arap_term_blocks_pallas,
        )

        ii, ij, ji, jj, b_arap_i, b_arap_j, rsq_a = arap_term_blocks_pallas(
            problem.nodes, R, t, e, wa
        )
        sq_arap = jnp.sum(rsq_a)
    else:
        g_i = problem.nodes[:, None]
        g_j = problem.nodes[e]
        rot = jnp.einsum("nij,nkj->nki", R, g_j - g_i, precision="highest")
        r_arap = rot + g_i + t[:, None] - g_j - t[e]
        r_arap = wa[..., None] * r_arap
        Ji = jnp.concatenate(
            [-hat(rot), jnp.broadcast_to(jnp.eye(3), (n, E_k, 3, 3))],
            axis=-1,
        ) * wa[..., None, None]  # [N, Ke, 3, 6]
        Jj = jnp.concatenate(
            [
                jnp.zeros((n, E_k, 3, 3)),
                -jnp.broadcast_to(jnp.eye(3), (n, E_k, 3, 3)),
            ],
            axis=-1,
        ) * wa[..., None, None]
        prec = config.normal_matrix_precision
        ii = jnp.sum(
            jnp.einsum("neai,neaj->neij", Ji, Ji, precision=prec), axis=1
        )  # [N, 6, 6] — diagonal blocks, direct add
        jj = jnp.einsum("neai,neaj->neij", Jj, Jj, precision=prec)
        ij = jnp.einsum("neai,neaj->neij", Ji, Jj, precision=prec)
        ji = ij.transpose(0, 1, 3, 2)
        b_arap_j = jnp.einsum(
            "neai,nea->nei", Jj, r_arap, precision="highest"
        )
        b_arap_i = jnp.sum(
            jnp.einsum("neai,nea->nei", Ji, r_arap, precision="highest"),
            axis=1,
        )
        sq_arap = jnp.sum(r_arap * r_arap)
    diag_seg = jnp.arange(n, dtype=jnp.int32) * n + jnp.arange(
        n, dtype=jnp.int32
    )
    # ONE fused scatter for all off-diagonal/pair contributions (point
    # K^2 pairs + ARAP ij/ji/jj) — each segment_sum is a dependent
    # scatter pass on TPU, so batching them shortens the per-iteration
    # op chain
    all_blocks = jnp.concatenate(
        [
            blk.reshape(-1, 36),
            ij.reshape(-1, 36),
            ji.reshape(-1, 36),
            jj.reshape(-1, 36),
        ],
        axis=0,
    )
    if plan is not None:
        u_cap = plan.slot_segs.shape[0]

        def compact_scatter(rows):
            c = jax.ops.segment_sum(
                rows, plan.compact_ids, num_segments=u_cap
            )
            return jnp.zeros((n * n, 36)).at[plan.slot_segs].set(
                c, mode="drop"
            )

        def direct_scatter(rows):
            return jax.ops.segment_sum(
                rows, pair_segment_ids(problem.point_anchors, problem.edges, n),
                num_segments=n * n,
            )

        M_blocks = jax.lax.cond(
            plan.overflow, direct_scatter, compact_scatter, all_blocks
        )
    else:
        all_segs = pair_segment_ids(
            problem.point_anchors, problem.edges, n
        )
        M_blocks = jax.ops.segment_sum(
            all_blocks, all_segs, num_segments=n * n
        )
    M_blocks = M_blocks.at[diag_seg].add(ii.reshape(-1, 36))
    b_nodes = jax.ops.segment_sum(
        jnp.concatenate([b_pt.reshape(-1, 6), b_arap_j.reshape(-1, 6)]),
        jnp.concatenate([a.reshape(-1), e.reshape(-1)]),
        num_segments=n,
    )
    b_nodes = b_nodes + b_arap_i
    sq = sq + sq_arap

    # ---- motion prior (translation diagonal)
    if config.w_motion:
        wm = jnp.sqrt(
            jnp.asarray(config.w_motion, jnp.float32)
        ) * problem.motion_confidence * problem.node_valid
        r_m = wm[:, None] * (problem.nodes + t - problem.motion_targets)
        mot = jnp.zeros((n, 6, 6)).at[:, 3:, 3:].set(
            jnp.eye(3) * (wm**2)[:, None, None]
        )
        M_blocks = M_blocks.at[diag_seg].add(mot.reshape(-1, 36))
        b_nodes = b_nodes.at[:, 3:].add(wm[:, None] * r_m)
        sq = sq + jnp.sum(r_m * r_m)

    M = (
        M_blocks.reshape(n, n, 6, 6)
        .transpose(0, 2, 1, 3)
        .reshape(6 * n, 6 * n)
    )
    return M, b_nodes.reshape(-1), sq


def diag_blocks(problem: GNProblem, config: GNConfig, R, t):
    """Per-node 6x6 diagonal blocks of JtJ (no N^2 scatter) — the
    block-Jacobi preconditioner for the matrix-free CG solver.

    Point term: sum over points/anchors of J_k^T J_k at k == l;
    ARAP: (i, i) and (j, j) blocks; motion: translation diagonal."""
    n = problem.nodes.shape[0]
    P, K = problem.point_anchors.shape
    g = problem.nodes[problem.point_anchors]
    Rk = R[problem.point_anchors]
    local = jnp.einsum(
        "pkij,pkj->pki", Rk, problem.source_points[:, None] - g,
        precision="highest",
    )
    w = problem.point_weights * problem.point_valid[:, None]
    sw = jnp.sqrt(jnp.asarray(config.w_point, jnp.float32))
    Jw = -hat(local) * w[..., None, None]
    Jt = jnp.broadcast_to(jnp.eye(3), (P, K, 3, 3)) * w[..., None, None]
    J = sw * jnp.concatenate([Jw, Jt], axis=-1)
    if config.data_term == "2d_depth":
        warped = jnp.sum(
            problem.point_weights[..., None]
            * (local + g + t[problem.point_anchors]),
            axis=1,
        )
        G = projection_row_scaling(warped, problem, config)
        J = jnp.einsum("pab,pkbc->pkac", G, J, precision="highest")
    blocks = jnp.einsum("pkai,pkaj->pkij", J, J, precision="highest")
    D = jax.ops.segment_sum(
        blocks.reshape(-1, 36), problem.point_anchors.reshape(-1),
        num_segments=n,
    ).reshape(n, 6, 6)

    E_k = problem.edges.shape[1]
    e = jnp.maximum(problem.edges, 0)
    rot = jnp.einsum(
        "nij,nkj->nki", R, problem.nodes[e] - problem.nodes[:, None],
        precision="highest",
    )
    wa = jnp.sqrt(
        jnp.asarray(config.w_arap, jnp.float32)
        * jnp.where(problem.edges >= 0, problem.edge_weights, 0.0)
    )
    Ji = jnp.concatenate(
        [-hat(rot), jnp.broadcast_to(jnp.eye(3), (n, E_k, 3, 3))], axis=-1
    ) * wa[..., None, None]
    D = D + jnp.sum(
        jnp.einsum("neai,neaj->neij", Ji, Ji, precision="highest"), axis=1
    )
    # (j, j) blocks: translation identity scaled by wa^2, scattered at e
    jj = (wa**2)[..., None, None] * jnp.broadcast_to(
        jnp.eye(3), (n, E_k, 3, 3)
    )
    jj_sum = jax.ops.segment_sum(
        jj.reshape(-1, 9), e.reshape(-1), num_segments=n
    ).reshape(n, 3, 3)
    D = D.at[:, 3:, 3:].add(jj_sum)

    if config.w_motion:
        wm2 = (
            jnp.asarray(config.w_motion, jnp.float32)
            * problem.motion_confidence**2
            * problem.node_valid
        )
        D = D.at[:, 3:, 3:].add(jnp.eye(3) * wm2[:, None, None])
    return D


@functools.partial(jax.jit, static_argnames=("config",))
def solve_dense(
    problem: GNProblem,
    config: GNConfig = GNConfig(),
    init_rotations: jnp.ndarray | None = None,
    init_translations: jnp.ndarray | None = None,
    scatter_plan: PairScatterPlan | None = None,
) -> GNResult:
    n = problem.nodes.shape[0]
    R0 = (
        init_rotations
        if init_rotations is not None
        else jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    )
    t0 = (
        init_translations
        if init_translations is not None
        else jnp.zeros((n, 3), jnp.float32)
    )
    free = (problem.solve_node_mask & problem.node_valid).astype(jnp.float32)
    free6 = jnp.repeat(free, 6)

    def gn_step(carry, _):
        R, t, ok = carry
        if config.assembly != "dense_j":
            M, b, sq = _assemble_blocks(
                problem, config, R, t, plan=scatter_plan
            )
        else:
            M, b, sq = _assemble(problem, config, R, t)
        # frozen/padded nodes: identity rows/cols, zero rhs
        M = M * free6[:, None] * free6[None, :]
        M = M + jnp.diag(
            jnp.where(free6 > 0, config.lm_damping, 1.0)
        )
        rhs = -b * free6
        if config.linear_solver == "cg":
            # block-Jacobi PCG on the assembled dense system: each
            # iteration is one [6N,6N] MXU matvec — avoids Cholesky's
            # sequential panel chain (latency-bound on TPU; measured
            # 22 ms per 6-iteration solve at the 128 cap)
            idx = jnp.arange(n)
            diag = M.reshape(n, 6, n, 6)[idx, :, idx, :]  # [n, 6, 6]
            inv_diag = jnp.linalg.inv(diag)  # batched 6x6

            def prec(v):
                return jnp.einsum(
                    "nij,nj->ni", inv_diag, v.reshape(n, 6),
                    precision="highest",
                ).reshape(-1) * free6

            def matvec(v):
                return jnp.einsum(
                    "ij,j->i", M, v, precision="highest"
                ) * free6

            z0 = prec(rhs)

            def cg_iter(state, _):
                xk, r, p, rz = state
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
                xk = xk + alpha * p
                r = r - alpha * Ap
                z = prec(r)
                rz2 = jnp.vdot(r, z)
                p = z + (rz2 / jnp.maximum(rz, 1e-20)) * p
                return (xk, r, p, rz2), None

            (x, _, _, _), _ = jax.lax.scan(
                cg_iter,
                (jnp.zeros_like(rhs), rhs, z0, jnp.vdot(rhs, z0)),
                None,
                length=config.dense_cg_iters,
            )
        elif config.linear_solver == "schur":
            from occlusionfusion_tpu.ops.blocksolve import spd_schur_solve

            x = spd_schur_solve(M, rhs, leaf=config.schur_leaf)
        elif config.linear_solver == "ns":
            from occlusionfusion_tpu.ops.blocksolve import (
                newton_schulz_solve,
            )

            x = newton_schulz_solve(
                M, rhs, block=config.ns_block, iters=config.ns_iters
            )
        else:
            chol, low = jax.scipy.linalg.cho_factor(M)
            x = jax.scipy.linalg.cho_solve((chol, low), rhs)
        x = x.reshape(n, 6)
        dw = x[:, :3] * config.step_length
        dt = x[:, 3:] * config.step_length
        finite = jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dt))
        dw = jnp.where(finite, dw, 0.0)
        dt = jnp.where(finite, dt, 0.0)
        R_new = jnp.einsum(
            "nij,njk->nik", so3_exp(dw), R, precision="highest"
        )
        return (R_new, t + dt, ok & finite), sq

    (R, t, ok), hist = jax.lax.scan(
        gn_step, (R0, t0, jnp.bool_(True)), None, length=config.iters
    )
    warped = ed_warp(
        problem.source_points,
        problem.nodes,
        R,
        t,
        problem.point_anchors,
        problem.point_weights,
    )
    eye = jnp.eye(3, dtype=jnp.float32)
    R = jnp.where(problem.node_valid[:, None, None], R, eye)
    t = jnp.where(problem.node_valid[:, None], t, 0.0)
    return GNResult(
        rotations=R,
        translations=t,
        warped_points=warped,
        residual_history=hist,
        valid=ok,
    )
