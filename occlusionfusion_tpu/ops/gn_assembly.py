"""Pallas fused GN assembly kernels (the north-star "JtJ block
assembly" kernels): one for the point data term, one for the ARAP edge
term.

The dense-GN iteration is assembly-bound on TPU: building the jacobian
blocks takes ~15 unfused XLA ops per term (anchor gathers, small
einsums, concats), each paying dispatch/bandwidth latency — measured
9.5 ms/iter at the 512-node cap, 2.8 at 128, while the true FLOPs are
trivial. ``point_term_blocks_pallas`` fuses the whole point-term
pipeline into ONE pass over point tiles:

  fetch per-anchor node data (R, g, t) by one-hot MXU matmuls (no
  gathers — same trick as ops/lbs.py), build the analytic jacobian
  blocks J_k = sw * [-w_k hat(R_k (x-g_k)) | w_k I], and emit
    * all K^2 anchor-pair products  J_k^T J_l  [T, 16*36], laid out in
      the scatter's (k, l) row-major segment order
    * the rhs contributions         J_k^T r    [T, 24]
    * the squared residual          r^T r      [T, 1]

``arap_term_blocks_pallas`` does the same for the ARAP edge term over
node tiles: fetch neighbor (g, t) rows by one-hot matmuls, build the
edge residual + Ji/Jj jacobians, and emit the diagonal ii block (summed
over edges), the ij/ji/jj scatter blocks, both rhs contributions, and
the squared residual — replacing ~12 XLA ops (gathers, 3 einsums, a
block transpose) with one pass.

The caller (solvers/gauss_newton_dense.py) reshapes the pair blocks
straight into scatter rows for the [N, N] block table — exactly like
the XLA "blocks" path, which is the cross-validation twin
(tests/test_gn_assembly.py).

Accuracy: node data rides the MXU as bf16 hi+lo (2-pass split, ~2^-17
relative — the same construction as DenseSkin); everything else is f32
on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# anchor-pair enumeration: all K^2 pairs in (k, l) row-major order —
# matching the scatter segment order (a_k * N + a_l) so the kernel
# output reshapes straight into scatter rows with no mirroring pass
K_ANCHORS = 4
PAIRS = [(k, l) for k in range(K_ANCHORS) for l in range(K_ANCHORS)]


def _assembly_kernel(pts_ref, tgt_ref, anchors_ref, weights_ref,
                     nd_hi_ref, nd_lo_ref, blk_ref, bvec_ref, sq_ref,
                     *, n_pad: int, sw: float):
    T = pts_ref.shape[0]
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n_pad), 1)

    # fetch per-anchor node rows (R 9 | g 3 | t 3) via one-hot matmuls;
    # bf16 one-hot is exact, node data is a 2-term hi/lo split
    G = []
    for k in range(K_ANCHORS):
        a = anchors_ref[:, k][:, None]
        onehot = (node_ids == a).astype(jnp.bfloat16)
        g_hi = jax.lax.dot_general(
            onehot, nd_hi_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_lo = jax.lax.dot_general(
            onehot, nd_lo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        G.append(g_hi + g_lo)  # [T, 128] (15 used)

    x = [pts_ref[:, c] for c in range(3)]
    # per anchor: local = R_k (x - g_k); J_k columns [3 rows x 6 cols]
    # laid out J[k][a][i] as 1-D [T] vectors
    J = []  # J[k][a][i]
    warped = [jnp.zeros((T,), jnp.float32) for _ in range(3)]
    for k in range(K_ANCHORS):
        Gk = G[k]
        w = weights_ref[:, k]
        R = [[Gk[:, 3 * r + c] for c in range(3)] for r in range(3)]
        g = [Gk[:, 9 + c] for c in range(3)]
        t = [Gk[:, 12 + c] for c in range(3)]
        d = [x[c] - g[c] for c in range(3)]
        local = [
            R[r][0] * d[0] + R[r][1] * d[1] + R[r][2] * d[2]
            for r in range(3)
        ]
        for c in range(3):
            warped[c] = warped[c] + w * (local[c] + g[c] + t[c])
        # -hat(local) = [[0, lz, -ly], [-lz, 0, lx], [ly, -lx, 0]]
        lx, ly, lz = local
        zero = jnp.zeros((T,), jnp.float32)
        wsw = w * sw
        neg_hat = [
            [zero, lz * wsw, -(ly * wsw)],
            [-(lz * wsw), zero, lx * wsw],
            [ly * wsw, -(lx * wsw), zero],
        ]
        Jk = []
        for a in range(3):
            row = [neg_hat[a][0], neg_hat[a][1], neg_hat[a][2],
                   zero, zero, zero]
            row[3 + a] = wsw
            Jk.append(row)
        J.append(Jk)

    # residual r = sw * (warped - target); target_ref cols 0..2; col 3 of
    # tgt carries the point validity (pre-multiplied into weights AND
    # needed for the residual gate)
    pv = tgt_ref[:, 3]
    r = [sw * pv * (warped[c] - tgt_ref[:, c]) for c in range(3)]

    # pair products blk[(k,l)][i][j] = sum_a J_k[a][i] * J_l[a][j]
    for p_idx, (k, l) in enumerate(PAIRS):
        for i in range(6):
            for j in range(6):
                acc = (
                    J[k][0][i] * J[l][0][j]
                    + J[k][1][i] * J[l][1][j]
                    + J[k][2][i] * J[l][2][j]
                )
                blk_ref[:, p_idx * 36 + i * 6 + j] = acc

    # rhs: b[k*6+i] = sum_a J_k[a][i] * r[a]
    for k in range(K_ANCHORS):
        for i in range(6):
            bvec_ref[:, k * 6 + i] = (
                J[k][0][i] * r[0] + J[k][1][i] * r[1] + J[k][2][i] * r[2]
            )
    sq_ref[:, 0] = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]


def _pack_node_table(nodes, R, t):
    """[n_pad, 128] node table (R 9 | g 3 | t 3 | zeros) as f32 plus the
    bf16 hi/lo split — shared by the point- and ARAP-term kernels (XLA
    CSEs the packing when both run in one program)."""
    N = nodes.shape[0]
    n_pad = -(-N // 128) * 128
    nd = jnp.concatenate([R.reshape(N, 9), nodes, t], axis=-1)  # [N, 15]
    nd = jnp.pad(nd, ((0, n_pad - N), (0, 128 - 15)))
    nd_hi = nd.astype(jnp.bfloat16)
    nd_lo = (nd - nd_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return nd, nd_hi, nd_lo


def point_term_blocks_pallas(
    points: jnp.ndarray,  # [P, 3]
    targets: jnp.ndarray,  # [P, 3]
    point_valid: jnp.ndarray,  # [P] f32
    anchors: jnp.ndarray,  # [P, 4]
    weights: jnp.ndarray,  # [P, 4] (raw skinning weights)
    nodes: jnp.ndarray,  # [N, 3]
    R: jnp.ndarray,  # [N, 3, 3]
    t: jnp.ndarray,  # [N, 3]
    sw: float,
    tile: int = 512,
):
    """Returns (blk [P, 16, 6, 6], b [P, 4, 6], rsq [P]) — the fused
    point-term contributions, pairs in (k, l) row-major PAIRS order."""
    P, K = anchors.shape
    assert K == K_ANCHORS
    N = nodes.shape[0]
    n_pad = -(-N // 128) * 128

    _, nd_hi, nd_lo = _pack_node_table(nodes, R, t)

    p_pad = -(-P // tile) * tile
    pts4 = jnp.pad(points.astype(jnp.float32), ((0, p_pad - P), (0, 1)))
    # pack validity into the target's 4th lane; gate weights by it too
    tgt4 = jnp.concatenate(
        [targets.astype(jnp.float32), point_valid.astype(jnp.float32)[:, None]],
        axis=-1,
    )
    tgt4 = jnp.pad(tgt4, ((0, p_pad - P), (0, 0)))
    w = weights * point_valid[:, None]
    anc = jnp.pad(anchors.astype(jnp.int32), ((0, p_pad - P), (0, 0)))
    wts = jnp.pad(w.astype(jnp.float32), ((0, p_pad - P), (0, 0)))

    blk, bvec, sq = pl.pallas_call(
        functools.partial(_assembly_kernel, n_pad=n_pad, sw=float(sw)),
        grid=(p_pad // tile,),
        # Mosaic accounts the full (not per-block) outputs against the
        # default 16MB scoped-VMEM limit here; raise it (v5e has 128MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, 576), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, 576), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        ],
    )(pts4, tgt4, anc, wts, nd_hi, nd_lo)
    blk = blk[:P].reshape(P, len(PAIRS), 6, 6)
    b = bvec[:P, :24].reshape(P, K, 6)
    rsq = sq[:P, 0]
    return blk, b, rsq


def _arap_kernel(own_ref, edges_ref, wa_ref, nd_hi_ref, nd_lo_ref,
                 ii_ref, ij_ref, ji_ref, jj_ref, bi_ref, bj_ref, sq_ref,
                 *, n_pad: int, e_k: int):
    T = own_ref.shape[0]
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n_pad), 1)
    own = own_ref[:]
    Ri = [[own[:, 3 * r + c] for c in range(3)] for r in range(3)]
    gi = [own[:, 9 + c] for c in range(3)]
    ti = [own[:, 12 + c] for c in range(3)]
    zero = jnp.zeros((T,), jnp.float32)

    ii = [[zero for _ in range(6)] for _ in range(6)]
    bi = [zero for _ in range(6)]
    sq = zero
    for k in range(e_k):
        a = edges_ref[:, k][:, None]
        onehot = (node_ids == a).astype(jnp.bfloat16)
        gj_hi = jax.lax.dot_general(
            onehot, nd_hi_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gj_lo = jax.lax.dot_general(
            onehot, nd_lo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        Gj = gj_hi + gj_lo
        gj = [Gj[:, 9 + c] for c in range(3)]
        tj = [Gj[:, 12 + c] for c in range(3)]
        wa = wa_ref[:, k]
        d = [gj[c] - gi[c] for c in range(3)]
        rot = [
            Ri[r][0] * d[0] + Ri[r][1] * d[1] + Ri[r][2] * d[2]
            for r in range(3)
        ]
        # residual r = wa * (rot + g_i + t_i - g_j - t_j)
        r = [wa * (rot[c] + gi[c] + ti[c] - gj[c] - tj[c]) for c in range(3)]
        # Ji = wa * [-hat(rot) | I]  (rows a, cols i)
        rx, ry, rz = rot
        nh = [
            [zero, rz * wa, -(ry * wa)],
            [-(rz * wa), zero, rx * wa],
            [ry * wa, -(rx * wa), zero],
        ]
        Jik = []
        for a_row in range(3):
            row = [nh[a_row][0], nh[a_row][1], nh[a_row][2],
                   zero, zero, zero]
            row[3 + a_row] = wa
            Jik.append(row)
        # diagonal block ii += Ji^T Ji
        for i in range(6):
            for j in range(6):
                ii[i][j] = ii[i][j] + (
                    Jik[0][i] * Jik[0][j]
                    + Jik[1][i] * Jik[1][j]
                    + Jik[2][i] * Jik[2][j]
                )
        # Jj = wa * [0 | -I] -> ij[i][3+b] = -wa * Ji[b][i]; ji = ij^T;
        # jj = wa^2 on the translation diagonal
        wa2 = wa * wa
        for i in range(6):
            for j in range(6):
                if j >= 3:
                    v = -(wa * Jik[j - 3][i])
                else:
                    v = zero
                ij_ref[:, k * 36 + i * 6 + j] = v
                ji_ref[:, k * 36 + j * 6 + i] = v
                jj_ref[:, k * 36 + i * 6 + j] = (
                    wa2 if (i == j and i >= 3) else zero
                )
        for i in range(6):
            bi[i] = bi[i] + (
                Jik[0][i] * r[0] + Jik[1][i] * r[1] + Jik[2][i] * r[2]
            )
            bj_ref[:, k * 6 + i] = (
                -(wa * r[i - 3]) if i >= 3 else zero
            )
        sq = sq + r[0] * r[0] + r[1] * r[1] + r[2] * r[2]

    for i in range(6):
        for j in range(6):
            ii_ref[:, i * 6 + j] = ii[i][j]
        bi_ref[:, i] = bi[i]
    sq_ref[:, 0] = sq


def arap_term_blocks_pallas(
    nodes: jnp.ndarray,  # [N, 3]
    R: jnp.ndarray,  # [N, 3, 3]
    t: jnp.ndarray,  # [N, 3]
    edges: jnp.ndarray,  # [N, E_k] (clamped >= 0)
    wa: jnp.ndarray,  # [N, E_k] sqrt(w_arap * edge_weight), 0 at invalid
    tile: int = 512,
):
    """Fused ARAP-term assembly: per-(node, edge) residual + jacobian +
    all four 6x6 block products + rhs in one Pallas pass over node
    tiles. Returns (ii [N,6,6] diag-add, ij/ji/jj [N,E_k,6,6] scatter
    blocks, b_i [N,6], b_j [N,E_k,6], rsq [N])."""
    N, E_k = edges.shape
    n_pad = -(-N // 128) * 128
    nd, nd_hi, nd_lo = _pack_node_table(nodes, R, t)
    tile = min(tile, n_pad)
    edges_p = jnp.pad(edges.astype(jnp.int32), ((0, n_pad - N), (0, 0)))
    wa_p = jnp.pad(wa.astype(jnp.float32), ((0, n_pad - N), (0, 0)))

    outs = pl.pallas_call(
        functools.partial(_arap_kernel, n_pad=n_pad, e_k=E_k),
        grid=(n_pad // tile,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec(
                (tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, 36), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k * 36), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k * 36), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k * 36), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, 6), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, E_k * 6), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 36), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, E_k * 36), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, E_k * 36), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, E_k * 36), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 6), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, E_k * 6), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
    )(nd, edges_p, wa_p, nd_hi, nd_lo)
    ii, ij, ji, jj, bi, bj, sq = outs
    return (
        ii[:N].reshape(N, 6, 6),
        ij[:N].reshape(N, E_k, 6, 6),
        ji[:N].reshape(N, E_k, 6, 6),
        jj[:N].reshape(N, E_k, 6, 6),
        bi[:N],
        bj[:N].reshape(N, E_k, 6),
        sq[:N, 0],
    )
