"""Lepard matcher stack tests.

No pretrained weights exist in the reference fork, so these are
behavior/wiring tests: pyramid invariants, KPConv shape/locality,
matching-layer math against small closed-form cases, and the
oracle-features end-to-end check (with discriminative features injected,
the matcher must recover a known rigid transform via soft Procrustes)."""

import numpy as np
import jax
import jax.numpy as jnp

from occlusionfusion_tpu.models import kpconv as K
from occlusionfusion_tpu.models import transformer3d as TR
from occlusionfusion_tpu.models.lepard import (
    LepardConfig,
    blend_anchor_motion,
    init_lepard_params,
    lepard_match,
    scene_flow,
)
from occlusionfusion_tpu.geometry import so3_exp


def random_cloud(n, cap, seed=0, scale=0.5):
    rng = np.random.RandomState(seed)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.randn(n, 3).astype(np.float32) * scale
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return jnp.asarray(pts), jnp.asarray(valid)


class TestGridSubsample:
    def test_reduces_and_averages(self):
        pts = jnp.asarray(
            [[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]], jnp.float32
        )
        valid = jnp.ones(3, bool)
        out, ov = K.grid_subsample(pts, valid, voxel=0.1, max_out=3)
        got = np.asarray(out)[np.asarray(ov)]
        assert got.shape[0] == 2
        # the two close points average
        assert any(np.allclose(g, [0.005, 0, 0], atol=1e-6) for g in got)

    def test_invalid_excluded(self):
        pts = jnp.zeros((4, 3))
        valid = jnp.asarray([True, False, False, False])
        out, ov = K.grid_subsample(pts, valid, voxel=0.1, max_out=4)
        assert int(ov.sum()) == 1


class TestNeighbors:
    def test_shadow_padding(self):
        q = jnp.zeros((1, 3))
        s = jnp.asarray([[0.01, 0, 0], [5.0, 0, 0]])
        nb = K.build_neighbors(
            q, jnp.ones(1, bool), s, jnp.ones(2, bool), radius=0.1, max_k=4
        )
        row = np.asarray(nb[0])
        assert (row == 2).sum() == 3  # one real neighbor, rest shadow
        assert 0 in row


class TestKPConv:
    def test_shadow_neighbors_contribute_zero(self):
        key = jax.random.PRNGKey(0)
        S, Q, Cin, Cout, KP = 8, 2, 4, 6, 15
        feats = jax.random.normal(key, (S, Cin))
        supports = jax.random.normal(jax.random.PRNGKey(1), (S, 3)) * 0.01
        queries = supports[:Q]
        w = jax.random.normal(jax.random.PRNGKey(2), (KP, Cin, Cout))
        kp = K.kernel_points(KP, 0.05)
        nb_full = K.build_neighbors(
            queries, jnp.ones(Q, bool), supports, jnp.ones(S, bool), 0.5, 6
        )
        out1 = K.kpconv(feats, supports, queries, nb_full, w, kp, 0.05)
        # add extra shadow columns: result must not change
        nb_more = jnp.pad(nb_full, ((0, 0), (0, 4)), constant_values=S)
        out2 = K.kpconv(feats, supports, queries, nb_more, w, kp, 0.05)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_pyramid_structure(self):
        pts, valid = random_cloud(300, 512, scale=0.3)
        cfg = K.PyramidConfig(level_sizes=(256, 128, 64, 32), first_voxel=0.05)
        levels = K.build_pyramid(pts, valid, cfg)
        assert len(levels) == 4
        counts = [int(l.valid.sum()) for l in levels]
        assert all(c > 0 for c in counts)
        assert counts[0] >= counts[1] >= counts[2] >= counts[3]


class TestCalibrateNeighborLimits:
    def test_limits_cover_keep_ratio(self):
        """Calibrated limits follow the reference's neighbor-mass
        percentile rule (dataloader.py:563): with keep_ratio=1.0 the
        limit equals the max true neighborhood size; smaller ratios
        give smaller-or-equal limits, all within the probe cap."""
        cfg = K.PyramidConfig(level_sizes=(256, 128, 64, 32), first_voxel=0.05)
        clouds = [random_cloud(280, 512, seed=s, scale=0.3) for s in range(3)]
        cal = K.calibrate_neighbor_limits(clouds, cfg, keep_ratio=0.8,
                                          hist_cap=48)
        cal_full = K.calibrate_neighbor_limits(clouds, cfg, keep_ratio=1.0,
                                               hist_cap=48)
        assert len(cal.max_neighbors) == 4
        for lo, hi in zip(cal.max_neighbors, cal_full.max_neighbors):
            assert 1 <= lo <= hi <= 48
        # the full-keep limit really is the observed max neighborhood size
        probe = cfg._replace(max_neighbors=(48,) * 4)
        for l in range(4):
            max_count = 0
            for pts, valid in clouds:
                lev = K.build_pyramid(pts, valid, probe)[l]
                counts = np.asarray(
                    (lev.neighbors < lev.points.shape[0]).sum(axis=1)
                )[np.asarray(lev.valid)]
                max_count = max(max_count, int(counts.max()))
            assert cal_full.max_neighbors[l] == max_count

    def test_pyramid_builds_with_calibrated_limits(self):
        cfg = K.PyramidConfig(level_sizes=(128, 64, 32, 16), first_voxel=0.06)
        clouds = [random_cloud(100, 256, seed=7, scale=0.25)]
        cal = K.calibrate_neighbor_limits(clouds, cfg, hist_cap=32)
        levels = K.build_pyramid(*clouds[0], cal)
        for lev, nmax in zip(levels, cal.max_neighbors):
            assert lev.neighbors.shape[1] == nmax


class TestMatchingMath:
    def test_dual_softmax_identity(self):
        f = jnp.eye(4) * 10
        conf = TR.dual_softmax_confidence(
            f, f, jnp.ones(4, bool), jnp.ones(4, bool), temperature=0.1
        )
        assert np.asarray(jnp.argmax(conf, axis=1)).tolist() == [0, 1, 2, 3]

    def test_sinkhorn_rows_normalize(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
        P = TR.sinkhorn_confidence(
            f, f, jnp.ones(5, bool), jnp.ones(5, bool), iters=10
        )
        np.testing.assert_allclose(np.asarray(P.sum(1)), 1.0, atol=0.05)

    def test_mutual_matches(self):
        conf = jnp.asarray(
            [[0.9, 0.0, 0.0], [0.0, 0.0, 0.8], [0.4, 0.5, 0.0]]
        )
        _, tgt, valid = TR.mutual_topk_matches(conf, threshold=0.1)
        assert np.asarray(tgt).tolist() == [0, 2, 1]
        assert np.asarray(valid).tolist() == [True, True, True]

    def test_soft_procrustes_recovers_rigid(self):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(40, 3), jnp.float32)
        R_gt = so3_exp(jnp.asarray([0.3, -0.2, 0.1]))
        t_gt = jnp.asarray([0.05, 0.1, -0.08])
        tgt = src @ R_gt.T + t_gt
        conf = jnp.eye(40)  # perfect correspondences
        R, t = TR.soft_procrustes(conf, src, tgt)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)

    def test_rotary_preserves_inner_product_shift(self):
        # rotary PE property: <rot(q,p1), rot(k,p2)> depends on p1-p2
        D = 12
        q = jax.random.normal(jax.random.PRNGKey(1), (1, D))
        k = jax.random.normal(jax.random.PRNGKey(2), (1, D))
        p = jnp.asarray([[0.1, 0.2, 0.3]])
        shift = jnp.asarray([[0.05, -0.07, 0.02]])
        def ip(pa, pb):
            ca, sa = TR.rotary_pe_3d(pa, D)
            cb, sb = TR.rotary_pe_3d(pb, D)
            return float(
                jnp.sum(TR.apply_rotary(q, ca, sa) * TR.apply_rotary(k, cb, sb))
            )
        a = ip(p, p + shift)
        b = ip(p + 0.5, p + shift + 0.5)
        assert abs(a - b) < 1e-3


class TestLepardEndToEnd:
    def test_match_pipeline_runs(self):
        cfg = LepardConfig(
            kpfcn=K.KPFCNConfig(
                pyramid=K.PyramidConfig(
                    level_sizes=(256, 96, 48, 24), first_voxel=0.06
                )
            )
        )
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        src, sv = random_cloud(200, 256, seed=1)
        tgt, tv = random_cloud(200, 256, seed=2)
        m = lepard_match(params, cfg, src, sv, tgt, tv)
        assert m.confidence.shape[0] == m.src_points.shape[0]
        assert bool(jnp.all(jnp.isfinite(m.confidence)))
        # rigid estimate is a rotation
        np.testing.assert_allclose(
            np.asarray(m.rigid_R @ m.rigid_R.T), np.eye(3), atol=1e-4
        )

    def test_batched_encode_matches_unbatched(self):
        """batched_encode stacks src+tgt into one vmapped pyramid+encoder
        pass — identical math to the two sequential passes (same coarse
        points, same confidences to float tolerance)."""
        pyr = K.PyramidConfig(level_sizes=(256, 96, 48, 24),
                              first_voxel=0.06)
        cfg0 = LepardConfig(kpfcn=K.KPFCNConfig(pyramid=pyr))
        cfg1 = cfg0._replace(batched_encode=True)
        params = init_lepard_params(jax.random.PRNGKey(0), cfg0)
        src, sv = random_cloud(200, 256, seed=1)
        tgt, tv = random_cloud(200, 256, seed=2)
        m0 = lepard_match(params, cfg0, src, sv, tgt, tv)
        m1 = lepard_match(params, cfg1, src, sv, tgt, tv)
        np.testing.assert_allclose(
            np.asarray(m0.src_points), np.asarray(m1.src_points), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m0.confidence), np.asarray(m1.confidence),
            atol=2e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(m0.match_valid), np.asarray(m1.match_valid)
        )

    def test_scene_flow_shapes(self):
        cfg = LepardConfig(
            kpfcn=K.KPFCNConfig(
                pyramid=K.PyramidConfig(
                    level_sizes=(256, 96, 48, 24), first_voxel=0.06
                )
            )
        )
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        src, sv = random_cloud(150, 256, seed=3)
        tgt, tv = random_cloud(150, 256, seed=4)
        flow, mask, m = scene_flow(params, cfg, src, sv, tgt, tv)
        assert flow.shape == (256, 3)
        assert bool(jnp.all(jnp.isfinite(flow)))

    def test_scene_flow_scale_normalization(self):
        """scene_flow(normalize_radius=r) is scale-equivariant: a 10x
        smaller scene yields 10x smaller flow with the same mask — the
        KPConv pyramid always sees the canonical-scale cloud."""
        cfg = LepardConfig()
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        src, sv = random_cloud(150, 256, seed=1, scale=0.3)
        tgt = src + 0.02
        f1, m1, _ = scene_flow(params, cfg, src, sv, tgt, sv,
                               normalize_radius=0.3)
        f2, m2, _ = scene_flow(params, cfg, src * 0.1, sv, tgt * 0.1, sv,
                               normalize_radius=0.3)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_allclose(
            np.asarray(f1) * 0.1, np.asarray(f2), atol=1e-5
        )

    def test_blend_anchor_motion(self):
        q = jnp.asarray([[0.0, 0, 0], [10.0, 0, 0]])
        anchors = jnp.asarray(
            [[0.01, 0, 0], [0.0, 0.01, 0], [0.0, 0, 0.01]]
        )
        flows = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.5]), (3, 3))
        flow, mask = blend_anchor_motion(
            q, anchors, flows, jnp.ones(3, bool), knn=3, radius=0.1
        )
        np.testing.assert_allclose(np.asarray(flow[0]), [0, 0, 0.5], atol=1e-5)
        assert bool(mask[0]) and not bool(mask[1])


class TestMotionCoherenceFilter:
    def _grid(self, n=6, spacing=0.05):
        xs = np.arange(n) * spacing
        g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        pts = np.concatenate([g, np.zeros((g.shape[0], 1))], -1)
        return pts.astype(np.float32)

    def test_outlier_rejected_smooth_kept(self):
        from occlusionfusion_tpu.models.lepard import motion_coherence_filter

        pts = self._grid()
        flows = np.tile([0.02, 0.0, 0.0], (pts.shape[0], 1)).astype(
            np.float32
        )
        flows[7] = [0.0, 0.0, 0.3]  # bridge-like outlier
        valid = np.ones(pts.shape[0], bool)
        out = motion_coherence_filter(
            jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
            knn=4, tau=0.08,
        )
        out = np.asarray(out)
        assert not out[7]
        keep = np.ones_like(valid)
        keep[7] = False
        assert out[keep].all()

    def test_articulated_boundary_survives(self):
        # two rigid halves with moderately different flows: a smooth
        # articulation must NOT be pruned (deviation at the boundary is
        # the inter-part flow difference, below tau)
        from occlusionfusion_tpu.models.lepard import motion_coherence_filter

        pts = self._grid()
        flows = np.where(
            pts[:, :1] < 0.14, [0.02, 0.0, 0.0], [0.0, 0.03, 0.0]
        ).astype(np.float32)
        valid = np.ones(pts.shape[0], bool)
        out = motion_coherence_filter(
            jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
            knn=4, tau=0.08,
        )
        assert np.asarray(out).all()

    def test_rotational_gradient_survives_small_tau(self):
        # in-plane rotation: flow = omega x r has a large smooth local
        # gradient; the MAD-scaled allowance must keep every match even
        # with a tau far below the flow magnitude (the limbs-regime
        # failure of a pure absolute threshold)
        from occlusionfusion_tpu.models.lepard import motion_coherence_filter

        pts = self._grid(n=8, spacing=0.06)
        c = pts.mean(0)
        r = pts - c
        flows = 0.09 * np.stack(  # ~5 deg/frame at canonical radius
            [-r[:, 1], r[:, 0], np.zeros(len(r))], -1
        ).astype(np.float32)
        valid = np.ones(pts.shape[0], bool)
        out = motion_coherence_filter(
            jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
            knn=4, tau=0.001, mad_mult=3.0,
        )
        assert np.asarray(out).all()
        # the same tau WITHOUT the MAD allowance prunes the field —
        # proving the allowance (not the floor) is what saves rotation
        out_abs = motion_coherence_filter(
            jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
            knn=4, tau=0.001, mad_mult=0.0,
        )
        assert not np.asarray(out_abs).all()

    def test_invalid_neighbors_neutral_and_quorum(self):
        from occlusionfusion_tpu.models.lepard import motion_coherence_filter

        pts = self._grid()
        flows = np.tile([0.02, 0.0, 0.0], (pts.shape[0], 1)).astype(
            np.float32
        )
        valid = np.zeros(pts.shape[0], bool)
        valid[0] = valid[1] = True  # below quorum everywhere
        out = motion_coherence_filter(
            jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
            knn=4, tau=1e-6,
        )
        # no quorum -> validity passes through even with a tiny tau
        np.testing.assert_array_equal(np.asarray(out), valid)

    def test_sparse_validity_outlier_still_rejected(self):
        # advisor r4: with few valid anchors globally, the old
        # self-flow substitution let the tested anchor's own flow
        # dominate the median slots, guaranteeing an outlier passed
        # while quorum was met. The masked median must reject it.
        from occlusionfusion_tpu.models.lepard import motion_coherence_filter

        pts = self._grid()
        flows = np.tile([0.02, 0.0, 0.0], (pts.shape[0], 1)).astype(
            np.float32
        )
        flows[7] = [0.0, 0.0, 0.3]  # outlier
        valid = np.zeros(pts.shape[0], bool)
        # exactly 4 valid anchors: the outlier + 3 coherent neighbors
        # (k+1=5 median slots; >=3 valid slots meets the >2 quorum)
        for i in (7, 6, 8, 12):
            valid[i] = True
        out = np.asarray(
            motion_coherence_filter(
                jnp.asarray(pts), jnp.asarray(flows), jnp.asarray(valid),
                knn=4, tau=0.08,
            )
        )
        assert not out[7]  # masked median sees only the real neighbors
        assert out[6] and out[8] and out[12]

    def test_scene_flow_coherence_config(self):
        # config plumbing: tau>0 must prune a planted bridge anchor's
        # influence on blended flow
        cfg = LepardConfig()
        assert cfg.coherence_tau == 0.0  # default off
        cfg_on = cfg._replace(coherence_tau=0.08)
        assert cfg_on.coherence_tau > 0.0


class TestSinkhornDustbin:
    def test_dustbin_absorbs_unmatched(self):
        import jax.numpy as jnp

        # 3 src, 2 tgt: one source remains unmatched
        f_src = jnp.eye(3, 8) * 10
        f_tgt = jnp.eye(2, 8) * 10
        P = TR.sinkhorn_confidence(
            f_src, f_tgt, jnp.ones(3, bool), jnp.ones(2, bool),
            iters=20, dustbin_score=0.0,
        )
        p = np.asarray(P)
        # matched pairs dominate their rows; the odd source row has low mass
        assert p[0, 0] > 0.5 and p[1, 1] > 0.5
        assert p[2].sum() < 0.5


class TestDeepKPFCN:
    def test_blocks_per_stage(self):
        import jax

        cfg = K.KPFCNConfig(
            blocks_per_stage=3,
            pyramid=K.PyramidConfig(level_sizes=(128, 64, 32, 16), first_voxel=0.08),
        )
        params = K.init_kpfcn_params(jax.random.PRNGKey(0), cfg)
        assert len(params["enc"][0]["res"]) == 3
        pts, valid = random_cloud(100, 128, seed=9)
        levels = K.build_pyramid(pts, valid, cfg.pyramid)
        feats, coarse = K.kpfcn_encode(params, cfg, levels)
        assert feats.shape == (32, cfg.out_dim)
        assert bool(jnp.all(jnp.isfinite(feats)))

    def test_full_depth_config(self):
        """Reference-depth backbone (3 strided stages, 2 resnetb each,
        1 decoder upsample): coarse output still at pyramid level 2, with
        level-3 context decoded in (backbone.py:120-142)."""
        import jax

        cfg = K.full_depth_config(
            first_dim=16, out_dim=24,
            pyramid=K.PyramidConfig(level_sizes=(128, 64, 32, 16), first_voxel=0.08),
        )
        params = K.init_kpfcn_params(jax.random.PRNGKey(0), cfg)
        assert len(params["enc"]) == 3
        assert len(params["enc"][0]["res"]) == 2
        assert len(params["dec"]) == 1
        pts, valid = random_cloud(100, 128, seed=9)
        levels = K.build_pyramid(pts, valid, cfg.pyramid)
        feats, coarse = K.kpfcn_encode(params, cfg, levels)
        # coarse level = num_stages - coarse_upsamples = 2 -> 32 points
        assert feats.shape == (32, cfg.out_dim)
        assert coarse.points.shape[0] == 32
        assert bool(jnp.all(jnp.isfinite(feats)))

    def test_full_depth_in_matcher_with_checkpoint_roundtrip(self, tmp_path):
        """End-to-end: full-depth backbone inside lepard_match, then a
        save/load roundtrip reproduces the exact same confidences."""
        import jax

        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
            save_lepard_checkpoint,
        )

        cfg = LepardConfig(
            kpfcn=K.full_depth_config(
                first_dim=16, out_dim=32,
                pyramid=K.PyramidConfig(
                    level_sizes=(256, 96, 48, 24), first_voxel=0.06
                ),
            ),
            reposition=TR.RepositionConfig(dim=32, heads=4),
        )
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        src, sv = random_cloud(200, 256, seed=1)
        tgt, tv = random_cloud(200, 256, seed=2)
        m = lepard_match(params, cfg, src, sv, tgt, tv)
        assert bool(jnp.all(jnp.isfinite(m.confidence)))

        path = str(tmp_path / "matcher.npz")
        save_lepard_checkpoint(path, params, cfg)
        params2, cfg2 = load_lepard_checkpoint(path)
        assert cfg2.kpfcn.num_stages == 3
        assert cfg2.kpfcn.coarse_upsamples == 1
        m2 = lepard_match(params2, cfg2, src, sv, tgt, tv)
        np.testing.assert_allclose(
            np.asarray(m.confidence), np.asarray(m2.confidence), atol=1e-6
        )


class TestAttentionOracle:
    def test_attention_layer_matches_numpy(self):
        """Dense MHA in the repositioning transformer vs a numpy oracle."""
        import math

        D, heads, P, S = 16, 4, 5, 7
        p = TR.init_attention_params(jax.random.PRNGKey(3), D, heads)
        rng = np.random.RandomState(1)
        x = rng.randn(P, D).astype(np.float32)
        src = rng.randn(S, D).astype(np.float32)
        src_valid = np.asarray([True] * 5 + [False] * 2)

        got = TR.attention_layer(
            p, jnp.asarray(x), jnp.asarray(src), jnp.ones(P, bool),
            jnp.asarray(src_valid), heads,
        )

        def lin(pp, v):
            return v @ np.asarray(pp["w"]) + np.asarray(pp["b"])

        q = lin(p["q"], x).reshape(P, heads, -1)
        k = lin(p["k"], src).reshape(S, heads, -1)
        v = lin(p["v"], src).reshape(S, heads, -1)
        dh = D // heads
        msg = np.zeros((P, heads, dh), np.float32)
        for h in range(heads):
            logits = q[:, h] @ k[:, h].T / math.sqrt(dh)
            logits[:, ~src_valid] = -1e30
            a = np.exp(logits - logits.max(1, keepdims=True))
            a /= a.sum(1, keepdims=True)
            msg[:, h] = a @ v[:, h]
        m = lin(p["merge"], msg.reshape(P, D))

        def ln(scale, bias, t):
            mu = t.mean(-1, keepdims=True)
            var = t.var(-1, keepdims=True)
            return (t - mu) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)

        m = ln(p["norm1_scale"], p["norm1_bias"], m)
        h_cat = np.concatenate([x, m], -1)
        gelu = lambda t: 0.5 * t * (1 + np.tanh(
            np.sqrt(2 / np.pi) * (t + 0.044715 * t**3)))
        hh = gelu(lin(p["mlp1"], h_cat))
        hh = lin(p["mlp2"], hh)
        hh = ln(p["norm2_scale"], p["norm2_bias"], hh)
        want = x + hh
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


class TestKernelDispositions:
    def test_lloyd_layout_properties(self):
        pts = np.asarray(K.kernel_points(15, radius=0.1, layout="lloyd"))
        assert pts.shape == (15, 3)
        # center point pinned at origin
        assert np.allclose(pts[0], 0.0)
        # all inside the influence ball
        norms = np.linalg.norm(pts, axis=1)
        assert norms[1:].max() <= 0.1 + 1e-6
        # deterministic (cached)
        pts2 = np.asarray(K.kernel_points(15, radius=0.1, layout="lloyd"))
        assert np.array_equal(pts, pts2)
        # Lloyd relaxation spreads points: min pairwise distance is a
        # healthy fraction of the radius (centroidal Voronoi of a ball)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        d += np.eye(15) * 1e9
        assert d.min() > 0.025

    def test_kp_layout_threads_through_config(self, tmp_path):
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
            save_lepard_checkpoint,
        )

        cfg = LepardConfig(kpfcn=K.KPFCNConfig(kp_layout="lloyd"))
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "m.npz")
        save_lepard_checkpoint(path, params, cfg)
        _, cfg2 = load_lepard_checkpoint(path)
        assert cfg2.kpfcn.kp_layout == "lloyd"
        # old side-cars without the key default to fibonacci
        import json

        with open(path + ".json") as fh:
            d = json.load(fh)
        del d["kpfcn"]["kp_layout"]
        with open(path + ".json", "w") as fh:
            json.dump(d, fh)
        _, cfg3 = load_lepard_checkpoint(path)
        assert cfg3.kpfcn.kp_layout == "fibonacci"
