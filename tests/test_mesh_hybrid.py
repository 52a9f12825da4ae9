"""Hybrid ICI x DCN mesh scaffolding + the analytic scaling model
(SURVEY.md §2.2 N6, §5 comm row; VERDICT r1 missing item 5)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from recommendation_models_tpu.parallel.mesh import get_hybrid_mesh, get_mesh
from recommendation_models_tpu.parallel.scaling import (
    LinkSpec, project_scaling, sweep_time_model)

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def test_slice_major_1d_mesh(cpu_mesh):
    m = get_mesh(8, platform="cpu", num_slices=2)
    assert m.devices.shape == (8,)
    # virtual slices are contiguous blocks: same order as jax.devices
    assert [d.id for d in m.devices.flat] == [d.id for d in
                                              jax.devices("cpu")[:8]]


def test_hybrid_mesh_2d_executes(cpu_mesh):
    m = get_hybrid_mesh(8, num_slices=2, platform="cpu")
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("dcn", "data")

    def body(x):
        # reduce within a slice over ICI, then across slices over DCN
        s = jax.lax.psum(x, "data")
        return jax.lax.psum(s, "dcn")

    f = jax.jit(shard_map(body, mesh=m, in_specs=P("dcn", "data"),
                          out_specs=P("dcn", "data")))
    x = jnp.arange(16.0).reshape(2, 8)
    out = np.asarray(f(x))
    # psum is elementwise over the (1, 2) blocks: every block becomes the
    # sum of all 8 blocks = [56, 64]
    np.testing.assert_allclose(out, np.tile([56.0, 64.0], (2, 4)))


def test_hybrid_mesh_validates_divisibility(cpu_mesh):
    import pytest
    with pytest.raises(ValueError):
        get_hybrid_mesh(8, num_slices=3, platform="cpu")


def test_scaling_model_basics():
    assert sweep_time_model(1.0, 0, 1)["efficiency"] == 1.0
    # communication-free scaling is perfect
    r = sweep_time_model(1.0, 0, 8)
    assert abs(r["efficiency"] - 1.0) < 1e-9
    # more bytes -> lower efficiency, monotonically
    effs = [sweep_time_model(1.0, b, 8)["efficiency"]
            for b in (1 << 20, 64 << 20, 1 << 30)]
    assert effs[0] > effs[1] > effs[2]


def test_scaling_model_ml25m_allgather_projection():
    """BASELINE config 5's >= 0.8 multi-host target, grounded: measured
    single-chip epoch (0.249 s rank 64 ML-25M) + the exact allgather bytes
    identity + public v5e link numbers."""
    k, n_users, n_items = 64, 162_541, 62_423

    def bytes_fn(S):
        # both halves' tiled all_gathers: (S-1) * css * k * 4 each
        return (S - 1) * ((n_items // S) + (n_users // S)) * k * 4

    rows = project_scaling(0.249, bytes_fn, [8, 16, 32],
                           slices_fn=lambda s: max(1, s // 8))
    by_s = {r["n_shards"]: r for r in rows}
    # 2 hosts (8 shards, one slice: pure ICI) comfortably over target
    assert by_s[8]["efficiency"] >= 0.8
    # multi-slice: DCN sets the comm floor; the model must reflect it
    assert by_s[32]["comm_s"] >= by_s[8]["comm_s"]
    # and a DCN 10x slower than default must hurt
    slow = sweep_time_model(0.249, bytes_fn(32), 32, num_slices=4,
                            links=LinkSpec(dcn_bytes_per_s=2.5e9))
    assert slow["efficiency"] < by_s[32]["efficiency"]
