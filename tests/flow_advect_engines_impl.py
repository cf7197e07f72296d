"""Full-engine advect tests — run via tests/test_flow_advect.py's
launcher in a fresh interpreter (three full-pipeline compiles; keeping
them out of the main pytest process keeps the session's in-process
compile count below the XLA:CPU compiler's crash threshold — see the
launcher's docstring)."""

import numpy as np
import jax
import pytest

try:
    from tests.test_fused_perception import config, make_seq
except ImportError:  # standalone pytest target: tests/ is on sys.path
    from test_fused_perception import config, make_seq

from occlusionfusion_tpu.fusion.pipeline import DynamicFusion
from occlusionfusion_tpu.models.pwcnet import (
    init_masknet_params,
    init_pwcnet_params,
)


class TestAdvectInEngines:
    @pytest.fixture(scope="class")
    def fused(self):
        seq = make_seq()
        fusion = DynamicFusion(
            seq,
            config(use_flow=True, flow_mode="advect", flow_lift="sparse"),
            flow_params=init_pwcnet_params(jax.random.PRNGKey(1)),
            mask_params=init_masknet_params(jax.random.PRNGKey(2)),
        )
        fusion.initialize(seq.load(0))
        return seq, fusion

    def test_fused_sparse_advect_runs(self, fused):
        seq, fusion = fused
        sc, state, tables = fusion.build_fused(None)
        state, info = fusion.register_frame_fused(
            sc, state, tables, seq.load(1), None
        )
        info = np.asarray(info)
        assert np.isfinite(info).all()
        assert info[1] > 0

    def test_stepwise_advect_runs(self, fused):
        seq, fusion = fused
        info = fusion.register_frame(seq.load(1))
        assert np.isfinite(info["final_loss"])
        assert info["n_correspondences"] > 0

    def test_fused_dense_advect_runs(self):
        seq = make_seq()
        fusion = DynamicFusion(
            seq,
            config(use_flow=True, flow_mode="advect", flow_lift="dense"),
            flow_params=init_pwcnet_params(jax.random.PRNGKey(1)),
        )
        fusion.initialize(seq.load(0))
        sc, state, tables = fusion.build_fused(None)
        state, info = fusion.register_frame_fused(
            sc, state, tables, seq.load(1), None
        )
        assert np.isfinite(np.asarray(info)).all()
