"""Hybrid ICI x DCN mesh scaffolding + the analytic scaling model
(SURVEY.md §2.2 N6, §5 comm row; VERDICT r1 missing item 5)."""

import numpy as np
import pytest
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


def _hybrid_problem(seed=21):
    import scipy.sparse as sp
    from recommendation_models_tpu.data.synthetic import synthetic_ratings
    n_users, n_items = 96, 80
    users, items, ratings = synthetic_ratings(n_users, n_items, 2400,
                                              rank=5, seed=seed)
    R = sp.csr_matrix((ratings, (users, items)), shape=(n_users, n_items))
    return R, n_users, n_items


def _hybrid_fit(R, n_users, n_items, cfg, D, S, sweeps, U0, V0):
    from recommendation_models_tpu.config import DataConfig
    from recommendation_models_tpu.data.layout import (build_layout,
                                                       csr_arrays,
                                                       shard_layout)
    from recommendation_models_tpu.parallel.hybrid_als import HybridALSProgram

    indptr, indices, data, _, _ = csr_arrays(R)
    dcfg = DataConfig(dense_whales=False, hot_cols=0)
    ul = build_layout(indptr, indices, data, n_users, n_items, dcfg)
    rows = np.repeat(np.arange(n_users), np.diff(indptr))
    from recommendation_models_tpu.data.layout import layout_from_coo
    il = layout_from_coo(rows, indices, data, n_users, n_items, dcfg,
                         transpose=True)
    mesh = get_hybrid_mesh(D * S, num_slices=D, platform="cpu")
    prog = HybridALSProgram(shard_layout(ul, S), shard_layout(il, S),
                            mesh, cfg)
    U, V = prog.place_factors(U0, V0)
    for _ in range(sweeps):
        U, V = prog.sweep(U, V)
    sse = float(prog.train_sse(U, V))
    return (np.asarray(U)[:n_users], np.asarray(V)[:n_items], sse, prog)


@pytest.mark.parametrize("alpha", [None, 1.5])
def test_hybrid_2d_fit_matches_single_device(cpu_mesh, alpha):
    """A FULL ALS fit executes on the 2-D (dcn, data) mesh — observations
    split across slices, rows sharded within — and matches the single-device
    result (VERDICT r2 missing item 3 / SURVEY.md N6)."""
    from recommendation_models_tpu.config import SolveConfig
    from recommendation_models_tpu.solver.als_sweep import (device_buckets,
                                                            make_sweep_fns)
    from recommendation_models_tpu.data.layout import (build_layout,
                                                       csr_arrays)
    from recommendation_models_tpu.config import DataConfig

    R, n_users, n_items = _hybrid_problem()
    cfg = SolveConfig(rank=5, reg=0.2, alpha=alpha)
    rng = np.random.default_rng(3)
    U0 = 0.05 * rng.standard_normal((n_users, 5)).astype(np.float32)
    V0 = 0.05 * rng.standard_normal((n_items, 5)).astype(np.float32)

    # single-device reference (same layout flavor)
    indptr, indices, data, _, _ = csr_arrays(R)
    dcfg = DataConfig(dense_whales=False, hot_cols=0)
    ul = build_layout(indptr, indices, data, n_users, n_items, dcfg)
    from recommendation_models_tpu.data.layout import layout_from_coo
    rows = np.repeat(np.arange(n_users), np.diff(indptr))
    il = layout_from_coo(rows, indices, data, n_users, n_items, dcfg,
                         transpose=True)
    sweep, train_sse = make_sweep_fns(device_buckets(ul), device_buckets(il),
                                      n_users, n_items, cfg)
    U = jnp.asarray(U0)
    V = jnp.asarray(V0)
    for _ in range(2):
        U, V = sweep(U, V)
    sse_ref = float(train_sse(U, V))

    U2, V2, sse2, prog = _hybrid_fit(R, n_users, n_items, cfg, D=2, S=4,
                                     sweeps=2, U0=U0, V0=V0)
    np.testing.assert_allclose(U2, np.asarray(U), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(V2, np.asarray(V), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(sse2, sse_ref, rtol=1e-4)
    b = prog.collective_bytes_per_sweep()
    assert b["dcn"] > 0 and b["ici"] > 0
    assert b["per_sweep_with_sse"] == b["per_sweep_total"] + b["sse_extra"]


def test_hybrid_2d_slice_count_invariance(cpu_mesh):
    """The result must not depend on how observations split across slices:
    (D=1,S=8) == (D=2,S=4) == (D=4,S=2)."""
    from recommendation_models_tpu.config import SolveConfig

    R, n_users, n_items = _hybrid_problem(seed=22)
    cfg = SolveConfig(rank=4, reg=0.3)
    rng = np.random.default_rng(5)
    U0 = 0.05 * rng.standard_normal((n_users, 4)).astype(np.float32)
    V0 = 0.05 * rng.standard_normal((n_items, 4)).astype(np.float32)
    outs = [_hybrid_fit(R, n_users, n_items, cfg, D, S, 2, U0, V0)[:3]
            for D, S in ((1, 8), (2, 4), (4, 2))]
    for U, V, sse in outs[1:]:
        np.testing.assert_allclose(U, outs[0][0], rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(sse, outs[0][2], rtol=1e-4)


def test_choose_topology_regimes():
    """The analytic DCN-byte comparison picks 1-D on MovieLens shapes and
    2-D only in the few-rows x huge-degree regime (docs/DESIGN.md)."""
    from recommendation_models_tpu.parallel.scaling import choose_topology
    # ML-25M rank-64, 2 slices of 8: table share ~ MBs, gram psum ~ GBs
    r = choose_topology(162_541, 62_423, 64, 16, 2)
    assert r["pick"] == "1d" and r["dcn_2d"] > 50 * r["dcn_1d"]
    # 1k rows x 10M-wide catalog (degree >> k): gram psum undercuts the
    # table share
    r2 = choose_topology(1_000, 10_000_000, 64, 16, 2)
    assert r2["pick"] == "2d"
    # single slice: no DCN either way
    assert choose_topology(10, 10, 8, 8, 1)["pick"] == "1d"


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


def test_estimator_topology_obs_parallel():
    """VERDICT r3 task 6: the 2-D hybrid program is reachable from the
    estimator surface — ALS(topology='obs_parallel') matches the
    single-device fit on the same warm start, exposes ici/dcn traffic,
    and rejects invalid combinations loudly."""
    import numpy as np
    import pytest
    from conftest import tiny_problem
    from recommendation_models_tpu.models.als import ALS

    R = tiny_problem(56, 42, density=0.3, seed=11)
    rng = np.random.default_rng(12)
    U0 = 0.1 * rng.standard_normal((56, 5)).astype(np.float32)
    V0 = 0.1 * rng.standard_normal((42, 5)).astype(np.float32)
    kw = dict(rank=5, reg=0.2, n_sweeps=3, solver="xla",
              compute_dtype="float32")
    m1 = ALS(**kw).fit(R, U0=U0, V0=V0)
    m2 = ALS(**kw, n_shards=8, num_slices=2, topology="obs_parallel",
             platform="cpu").fit(R, U0=U0, V0=V0)
    np.testing.assert_allclose(m2.U_, m1.U_, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m2.history_, m1.history_, rtol=2e-4)
    b = m2.exchange_bytes_per_sweep_
    assert b["ici"] > 0 and b["dcn"] > 0
    # serving works off the materialized host tables
    _, items = m2.recommend([0, 1], n=5)
    assert items.shape == (2, 5)

    with pytest.raises(ValueError, match="divisible"):
        ALS(**kw, n_shards=8, num_slices=3, topology="obs_parallel",
            platform="cpu").fit(R)
    with pytest.raises(ValueError, match="exchange"):
        ALS(**kw, n_shards=8, num_slices=2, topology="obs_parallel",
            exchange="all_to_all", platform="cpu").fit(R)
    with pytest.raises(ValueError, match="topology"):
        ALS(**kw, n_shards=8, topology="ring", platform="cpu").fit(R)
    with pytest.raises(ValueError, match="n_shards"):
        ALS(**kw, topology="obs_parallel").fit(R)   # silent-ignore guard
    with pytest.raises(ValueError, match="num_slices"):
        # 1-slice obs_parallel = zero observation parallelism (r4 review)
        ALS(**kw, n_shards=8, topology="obs_parallel", platform="cpu").fit(R)
