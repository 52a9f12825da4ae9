"""Fused batched Cholesky solve — Pallas TPU kernel (SURVEY.md N2).

Replaces the reference's per-row ``scipy.linalg.solve`` (SURVEY.md §2.1 row 4,
§3.1: LAPACK ``posv`` on one k×k system per Python-loop iteration). XLA's
batched ``jnp.linalg.cholesky`` on TPU loops over scalar panels and runs at
~12 GFLOP/s for (8192, 64, 64) batches (measured on v5e: 61 ms); this kernel
does the whole factor + forward + backward substitution in one VMEM-resident
pass.

Key design choice: **batch-minor layout**. The systems are stored
``(k, k, B)`` so the batch dimension rides the 128-wide lane axis of the VPU
and every step of the factorization — one rsqrt, one column scale, one
rank-1 trailing update — is a dense vectorized op over all ``BT`` systems in
the block. The j-loop is a ``fori_loop`` over ref slices (``pl.ds``), so one
compilation covers every batch block. FLOP count is ~6x the triangular
minimum (we update the full (k,k) square each step instead of the trailing
submatrix), but every FLOP is lane-parallel — a winning trade for k ≤ 256.

The wrapper accepts the natural ``(B, k, k)`` / ``(B, k)`` shapes, pads
``k`` to the 8-sublane multiple (identity diagonal on the extension keeps
the systems SPD) and ``B`` to the block multiple, and transposes in/out.
Interpret mode runs automatically off-TPU so CPU CI exercises the same code
path (SURVEY.md §4.2-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block_batch(k: int) -> int:
    """Batch block size: keep the (k, k, BT) scratch + double-buffered input
    inside ~12 MB of VMEM while holding the 128-lane dim full when we can.
    Callers that pre-pad their batch to this multiple skip a whole-array
    pad+copy in the wrapper.

    At k in (64, 160] the block is 256 (two 128-lane vregs wide): the
    factorization is vreg-op-throughput-bound, so lanes-per-pass don't
    change total vector work, but each serial pass carries fixed
    scalar-side cost (loop control, ds slicing, mask iotas) that a wider
    block amortizes over twice the systems — measured at k=128 on v5e per
    32k systems: 33.4 ms at bt=128 vs 26.5 at 256 (-21% isolated; epoch
    0.507 -> 0.484 s). bt=512 is ANOTHER isolated win (24.3 ms, compiles
    at ~102 MB VMEM under a raised 120 MB limit) but the WHOLE EPOCH
    regresses to 0.547 s — more than the ~2% extra padded systems explain;
    the near-limit VMEM footprint plausibly starves XLA's scheduling of
    the surrounding gather/einsum ops. Another isolated-probe trap
    (CLAUDE.md): whole-epoch numbers decide, 256 stays.

    Above k=160 the wide block no longer fits: shrink the lane dim so
    3 * k^2 * bt * 4B stays under ~40 MB. A sub-128 lane block is only a
    legal Mosaic operand when it spans the WHOLE batch (single-block
    grid) — multi-block large-k solves must take the XLA path; see
    pallas_supported()."""
    kp = -(-k // 8) * 8
    if kp <= 32:
        return 512
    if kp <= 160:
        return 256    # incl. k <= 64 (bt=512 there regresses whole-epoch)
    return max(8, (40 * 1024 * 1024 // (3 * kp * kp * 4)) // 8 * 8)


def pallas_supported(k: int, b: int, two_operand: bool = False) -> bool:
    """Whether the compiled kernel can solve a (k, k, b) batch on TPU.

    When the VMEM-bounded batch block is narrower than 128 lanes (k > 160
    for BOTH the single-operand path and the two-operand ``Gt2`` path —
    the halved two-operand block is still exactly 128 lanes up to k=160;
    see _cholesky_solve_t), Mosaic only accepts the block when it
    EQUALS the (padded) batch — i.e. a single-block grid. Multi-block
    narrow-lane solves route to the XLA anchor instead (a rare robustness
    case, not a tuned path; interpret mode has no such constraint but
    follows the same rule so CPU CI exercises the decision).

    At extreme k (>~660) even block_batch's 8-wide floor blows the VMEM
    budget (3 refs * k^2 * 8 * 4B > the ~40 MB target): return False so the
    caller falls back to XLA instead of a Mosaic/VMEM compile failure."""
    kp = -(-k // 8) * 8
    bt = block_batch(kp)
    if two_operand:
        bt = max(bt // 2 // 8 * 8, 8)   # mirrors _cholesky_solve_t
    # kp <= 160 blocks are hand-sized against the real VMEM limit (see
    # block_batch); the budget guard only polices the formula branch,
    # whose 8-wide floor can exceed the 40 MB target past k~660.
    if kp > 160 and 3 * kp * kp * bt * 4 > 40 * 1024 * 1024:
        return False
    return bt >= 128 or b <= bt


_block_batch = block_batch


def _use_interpret() -> bool:
    """Compiled Mosaic on a real TPU backend; interpreter everywhere else
    (CPU CI forces default_device=cpu — SURVEY.md §4.2)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev)) != "tpu"
    return jax.default_backend() != "tpu"


def _cholesky_solve_kernel_panel(g_ref, rhs_ref, reg_ref, out_ref, a_ref,
                                 y_ref, x_ref, c_ref, ct_ref):
    """Panel-blocked variant: factor PW=8 columns at a time against small
    scratch panel buffers, then apply ONE rank-8 trailing update — the full
    (k, k, BT) array is read-modified-written k/8 times instead of k times
    (the factorization is VMEM-bandwidth-bound, so this is ~the win).

    Column p of the panel needs its row/column corrected by the panel's
    earlier columns before normalization; those corrections are <=7 cheap
    fmas on (k, 1, bt)/(1, k, bt) vectors served from the panel scratch
    (c_ref (k, PW, bt) columns, ct_ref (PW, k, bt) rows), kept out of A
    until the single trailing update. The panel loop is a fori_loop (NOT
    unrolled over all k columns — full unrolling chokes the Mosaic
    compiler); only the PW inner steps unroll. Substitutions are identical
    to the rank-1 kernel.
    """
    k, _, bt = a_ref.shape
    PW = c_ref.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    # G may arrive bf16 (half the HBM read); factorization is f32 in VMEM
    a_ref[:] = (g_ref[:].astype(jnp.float32)
                + jnp.where(ri == ci, 1.0, 0.0) * reg_ref[:][None])
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    def panel_step(q, carry):
        j0 = q * PW
        for jj in range(PW):
            j = j0 + jj
            col = a_ref[:, pl.ds(j, 1), :]                    # (k, 1, bt)
            row = a_ref[pl.ds(j, 1), :, :]                    # (1, k, bt)
            for p in range(jj):
                # deferred corrections from this panel's earlier columns
                col = col - c_ref[:, p:p + 1, :] * ct_ref[p:p + 1,
                                                          pl.ds(j, 1), :]
                row = row - ct_ref[p:p + 1, :, :] * c_ref[pl.ds(j, 1),
                                                          p:p + 1, :]
            # diagonal element: col/row are values (no dynamic value
            # slicing in Mosaic), so extract via a masked reduce of the
            # corrected row (row[0, j] == col[j, 0] by residual symmetry)
            diag = jnp.sum(jnp.where(cols == j, row, 0.0), axis=1,
                           keepdims=True)                     # (1, 1, bt)
            inv_s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
            c = jnp.where(rows > j, col * inv_s, 0.0)
            ct = jnp.where(cols > j, row * inv_s, 0.0)
            c_ref[:, jj:jj + 1, :] = jnp.reshape(c, (k, 1, bt))
            ct_ref[jj:jj + 1, :, :] = jnp.reshape(ct, (1, k, bt))
            a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, diag * inv_s, c)
        # one rank-PW read-modify-write pass; the already-written L columns
        # of this panel must not be touched, so mask to the trailing block
        trail = cols >= j0 + PW
        upd = c_ref[:, 0:1, :] * jnp.where(trail, ct_ref[0:1, :, :], 0.0)
        for p in range(1, PW):
            upd = upd + c_ref[:, p:p + 1, :] * jnp.where(
                trail, ct_ref[p:p + 1, :, :], 0.0)
        a_ref[:] = a_ref[:] - upd
        return carry

    jax.lax.fori_loop(0, k // PW, panel_step, 0, unroll=False)

    # ---- forward substitution: L y = rhs (y is (1, k, BT)) ----------------
    y_ref[:] = jnp.zeros((1, k, bt), jnp.float32)

    def fwd_step(j, carry):
        row = a_ref[pl.ds(j, 1), :, :]
        s = jnp.sum(row * y_ref[:], axis=1, keepdims=True)
        d = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        rj = jnp.reshape(rhs_ref[pl.ds(j, 1), :], (1, 1, bt))
        y_ref[:, pl.ds(j, 1), :] = (rj - s) / jnp.maximum(d, 1e-30)
        return carry

    jax.lax.fori_loop(0, k, fwd_step, 0, unroll=False)

    # ---- backward substitution: L^T x = y (x is (k, 1, BT)) ---------------
    x_ref[:] = jnp.zeros((k, 1, bt), jnp.float32)

    def bwd_step(t, carry):
        j = k - 1 - t
        col = a_ref[:, pl.ds(j, 1), :]
        s = jnp.sum(col * x_ref[:], axis=0, keepdims=True)
        d = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        yj = y_ref[:, pl.ds(j, 1), :]
        v = (yj - s) / jnp.maximum(d, 1e-30)
        x_ref[pl.ds(j, 1), :, :] = v
        out_ref[pl.ds(j, 1), :] = jnp.reshape(v, (1, bt))
        return carry

    jax.lax.fori_loop(0, k, bwd_step, 0, unroll=False)


def _cholesky_solve_kernel(subs2, g_ref, rhs_ref, reg_ref, out_ref, a_ref,
                           y_ref, x_ref):
    """One batch block: g (k, k, BT) SPD systems, rhs (k, BT), per-system
    ridge reg (1, BT) -> out (k, BT).

    The ridge is added on load (``A = G + reg I``), fusing what would
    otherwise be a whole-array read-modify-write pass in HBM before the
    kernel. a_ref (k, k, BT) holds the in-place factorization; y_ref
    (1, k, BT) the forward-substitution intermediate (dim1-major so the
    running inner products need no relayouts); x_ref (k, 1, BT) the backward
    result (dim0-major, same reason).

    Relayout-free trick: the unprocessed trailing block of A stays symmetric
    (full-square rank-1 updates preserve symmetry; column writes only zero
    the *processed* upper entries), so the transposed update vector c^T is
    read from row j instead of reshaping column j across sublanes.
    """
    k, _, bt = a_ref.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    # G may arrive bf16 (half the HBM read); factorization is f32 in VMEM
    a_ref[:] = (g_ref[:].astype(jnp.float32)
                + jnp.where(ri == ci, 1.0, 0.0) * reg_ref[:][None])
    _factor_solve_body(a_ref, rhs_ref, out_ref, y_ref, x_ref, subs2=subs2)


# (rank-1 body above kept as the reference variant; the pair body below is
# the default everywhere — bit-identical results, fewer RMW passes)
def _cholesky_solve_kernel_pair(subs2, g_ref, rhs_ref, reg_ref, out_ref,
                                a_ref, y_ref, x_ref):
    """Rank-1 kernel with the rank-2 factorization body (_factor_body_pair:
    two columns per trailing read-modify-write pass)."""
    k, _, bt = a_ref.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    a_ref[:] = (g_ref[:].astype(jnp.float32)
                + jnp.where(ri == ci, 1.0, 0.0) * reg_ref[:][None])
    _factor_solve_body(a_ref, rhs_ref, out_ref, y_ref, x_ref, pair=True,
                       subs2=subs2)


def _cholesky_solve_kernel_2g(subs2, g_ref, g2_ref, rhs_ref, reg_ref,
                              out_ref, a_ref, y_ref, x_ref):
    """Two-operand variant: ``A = G1 + G2 + reg I`` summed in VMEM on load.

    Exists so callers with an extra additive gram term (the hot-column
    contribution, solver/als_sweep.py) never materialize ``G1 + G2`` in
    HBM: the custom call pins BOTH operands to the batch-minor layout, so
    each producing matmul emits its natural layout and XLA inserts no
    relayout copies (a plain ``G1 + G2`` in XLA broke the gram einsum's
    klb epilogue fold and cost ~26 ms per ML-25M bucket, measured).
    """
    k, _, bt = a_ref.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    a_ref[:] = (g_ref[:].astype(jnp.float32) + g2_ref[:].astype(jnp.float32)
                + jnp.where(ri == ci, 1.0, 0.0) * reg_ref[:][None])
    _factor_solve_body(a_ref, rhs_ref, out_ref, y_ref, x_ref, pair=True,
                       subs2=subs2)


def hot_cols_cap(k: int) -> int:
    """Max hot-column count C whose (k*k, C) f32 outer-product table fits
    the fused kernel's 16 MB scoped-vmem budget alongside the
    double-buffered (k, k, bt) gram blocks and the factorization scratch
    (~2 MiB for the table; measured: 2.5 MiB OOMs at 18.4M/16M).

    The P table must be f32: it holds EXACT products of the bf16-rounded
    factors, making G_hot an exact gram of the same rounded table the
    gathered path contracts — guaranteed PSD. A bf16 P (rounded products)
    made G_hot indefinite by up to 2^-8 * tr(G_hot), which NaN'd rows whose
    gathered gram was weak, and ridge-inflating by that bound cost visible
    RMSE (0.21 -> 0.29 at bench 'tiny'). 8-aligned; 128 at k=64, 32 at
    k=128; capped at 1024 (tiny ranks would otherwise allow absurd widths
    whose per-bucket slabs cost more than they save)."""
    return min(max((2 * 1024 * 1024 // (k * k * 4)) // 8 * 8, 0), 1024)


def hot_cols_auto(k: int) -> int:
    """Hot-column width for the ALS/bench auto policy: the VMEM cap, unless
    it has shrunk below the break-even slab width. Measured on v5e at ML-25M
    shapes: C=128 at k=64 saves ~30 ms/epoch, but C=32 at k=128 COSTS ~15 ms
    per half-sweep (the per-bucket slab dots + in-kernel table build no
    longer pay for the few gathers that 32 columns remove)."""
    cap = hot_cols_cap(k)
    return cap if cap >= 64 else 0


def _cholesky_solve_kernel_hot(alpha, eps, bt, subs2, g_hbm, hv_ref, vT_ref,
                               rhs_ref, reg_ref, out_ref, a_ref, y_ref,
                               x_ref, p_ref, sem):
    """Fused hot-column variant: the hot block's gram and rhs contributions
    are computed IN VMEM from the raw (C, bt) f16 value slab —

        A   = G + P_hot^T diag-weights + reg I      (one (k^2,C)x(C,bt) MXU dot)
        rhs'= rhs + V_hot^T rhs-weights             (one (k,C)x(C,bt) dot)

    — so the (k^2, B) hot gram never exists in HBM (XLA-level formulations
    all lost more to materialization + relayout than the gather savings;
    see solver/als_sweep.py history). ``alpha`` is the static implicit-
    feedback confidence (None = explicit least squares); weights follow
    ops.gram.objective_weights.

    ``eps``: static PSD safety margin, eps * tr(G_hot) added to the ridge.
    Any rounding of G_hot's entries away from the exact gram of the rounded
    factor table can leave it indefinite by up to that bound — enough to
    NaN the factorization on rows whose gathered gram is weak (most
    observations hot; hit at bench 'tiny' scale both with a bf16 P table
    and with a DEFAULT-precision f32 dot, which a TPU runs as ONE bf16
    pass). The dot below runs at HIGHEST precision over an exact f32
    product table built in VMEM, so the caller passes eps=0 (f32
    accumulation rounding is 2^-24-class, the same exposure the gathered
    gram path has always had); keep eps > 0 only if reintroducing rounded
    tables (a 2^-8 margin measurably hurt RMSE, a 2^-16 one broke 1e-5
    parity tests).

    rhs' is staged in out_ref: forward substitution consumes row j of it
    before backward substitution overwrites that row with the solution.

    The gram block is DMA'd from HBM straight into the factorization
    scratch (``g_hbm`` is an ANY-space ref; the copy overlaps the hot-dot
    compute). A pipelined VMEM input would double-buffer an extra
    (k, k, bt) block and blow XLA's 16 MB scoped-vmem check at bt=256
    (measured 22.4M) — and halving bt costs ~40% solve time instead.
    """
    k = a_ref.shape[0]
    c = vT_ref.shape[1]
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        g_hbm.at[:, :, pl.ds(i * bt, bt)], a_ref, sem)
    cp.start()
    hv = hv_ref[:].astype(jnp.float32)                      # (C, bt)
    if alpha is None:
        wg = (hv != 0.0).astype(jnp.float32)
        wr = hv
    else:
        wg = alpha * hv
        wr = (hv != 0.0).astype(jnp.float32) + alpha * hv
    # outer-product table built IN VMEM from the f32 (compute-dtype-rounded)
    # factor rows — exact products, never streamed from HBM
    vt = vT_ref[:]                                          # (k, C) f32
    p_ref[:] = vt[:, None, :] * vt[None, :, :]              # (k, k, C)
    ghot = jax.lax.dot_general(
        p_ref[:].reshape(k * k, c), wg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # (k*k, bt)
    # rhs dot is tiny ((k, C) lhs) — run it f32/HIGHEST too so the f32
    # compute mode stays bit-comparable to the hot-disabled path
    rhot = jax.lax.dot_general(
        vt, wr, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # (k, bt)
    reg = reg_ref[:]
    if eps:
        vn2 = jnp.sum(vt * vt, axis=0, keepdims=True)       # (1, C) |v_c|^2
        tr = jax.lax.dot_general(
            vn2, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, bt)
        reg = reg + eps * tr
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    cp.wait()
    a_ref[:] = (a_ref[:]
                + ghot.reshape(k, k, bt)
                + jnp.where(ri == ci, 1.0, 0.0) * reg[None])
    out_ref[:] = rhs_ref[:] + rhot
    # rhs'-staged-in-out_ref is subs2-safe: forward substitution reads ALL
    # rhs rows before backward substitution overwrites any of them
    _factor_solve_body(a_ref, out_ref, out_ref, y_ref, x_ref, pair=True,
                       subs2=subs2)


def _factor_body_pair(a_ref):
    """Rank-2 factorization: TWO columns per trailing-update pass.

    The rank-1 body's dominant cost is the read-modify-write of the (k, k,
    BT) block every step; fusing columns (j, j+1) halves those passes. The
    inter-column correction is cheap — column/row j+1 corrected by column
    j's rank-1 on (k, 1, bt)/(1, k, bt) vectors, with the two cross terms
    (ct1 at column j+1, c1 at row j+1) extracted by masked reduces (the
    same no-dynamic-value-slicing trick as the diagonal). Unlike the
    rank-8 panel variant (slower, see cholesky_solve docstring) there is
    no panel scratch and only 2 extra reduces per pair.

    Rank-2 is the measured sweet spot: rank-1 -> rank-2 is -8% at k=64 and
    -18% at k=128 (bit-identical), but a register-resident rank-4 (no
    scratch, corrections in values) measured 37-57% SLOWER than rank-2 —
    the O(W^2) masked-reduce cross-terms grow faster than the saved
    read-modify-write passes shrink. Do not widen further.
    """
    k, _, bt = a_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    RP = 8

    def pair_step(q, carry):
        j = 2 * q
        d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]                 # (1, 1, bt)
        inv1 = jax.lax.rsqrt(jnp.maximum(d1, 1e-30))
        col1 = a_ref[:, pl.ds(j, 1), :]                         # (k, 1, bt)
        row1 = a_ref[pl.ds(j, 1), :, :]                         # (1, k, bt)
        c1 = jnp.where(rows > j, col1 * inv1, 0.0)
        ct1 = jnp.where(cols > j, row1 * inv1, 0.0)
        # column/row j+1, corrected by (c1, ct1). The cross term L[j+1, j]
        # is a single element — read it via a dynamic REF slice (same trick
        # as the diagonal d1) instead of full-width masked reduces; by
        # residual symmetry the row and column cross terms are equal.
        a12 = a_ref[pl.ds(j, 1), pl.ds(j + 1, 1), :]            # (1, 1, bt)
        l12 = a12 * inv1                                        # = c1[j+1]
        col2 = a_ref[:, pl.ds(j + 1, 1), :] - c1 * l12
        row2 = a_ref[pl.ds(j + 1, 1), :, :] - l12 * ct1
        d2 = (a_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :] - l12 * l12)
        inv2 = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
        c2 = jnp.where(rows > j + 1, col2 * inv2, 0.0)
        ct2 = jnp.where(cols > j + 1, row2 * inv2, 0.0)
        for r in range(k // RP):
            @pl.when(j < (r + 1) * RP)
            def _upd(r=r):
                sl = pl.ds(r * RP, RP)
                a_ref[sl, :, :] = (a_ref[sl, :, :]
                                   - c1[r * RP:(r + 1) * RP] * ct1
                                   - c2[r * RP:(r + 1) * RP] * ct2)
        a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, d1 * inv1, c1)
        a_ref[:, pl.ds(j + 1, 1), :] = jnp.where(rows == j + 1,
                                                 d2 * inv2, c2)
        return carry

    jax.lax.fori_loop(0, k // 2, pair_step, 0, unroll=False)


def _factor_body_schur(a_ref):
    """Two-level Schur factorization (the 'next frontier' of docs/PERF.md's
    rank-128 anatomy): split A into k/2-wide column blocks.

        phase 1: factor columns [0, h) with trailing updates RESTRICTED to
                 the left column block (cols < h) plus the A12 rows still
                 to be read (rows < h, cols >= h) — the A22 quadrant's
                 corrections are DEFERRED;
        phase 2: apply the deferred Schur update A22 -= L21 L21^T as
                 rank-8 accumulation passes.  Unlike widening the factor
                 step (rank-4/8 measured 37-57% slower — cross-term masked
                 reduces), accumulation passes need NO corrections and NO
                 serial dependency between groups;
        phase 3: factor columns [h, k) with updates restricted to the
                 right column block.

    vs the rank-2 pair body this removes the (k-j) x (cols < j) dead
    writes of every pass (~25% of the 2.1 MFLOP/system at k=128) and turns
    another ~25% into dependency-free accumulation.  Zero extra VMEM: each
    L21^T row is stashed in that row's OWN dead A12 slot (row j's [h:]
    segment is read for the last time at pass j), and phase 3's column
    writes reclaim the region afterwards.  NOT bit-identical to the pair
    body (A22 corrections apply in grouped order), but the same exact f32
    algorithm; parity is covered by the same oracle tolerances.

    Requires k % 16 == 0; measured SLOWER than the pair body at k = 128
    (+12%, docs/PERF.md) — kept as a non-default reference variant.
    """
    k, _, bt = a_ref.shape
    h = k // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    RP = 8

    def pair_cols(j):
        """Shared rank-2 column pair computation (same as the pair body)."""
        d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        inv1 = jax.lax.rsqrt(jnp.maximum(d1, 1e-30))
        col1 = a_ref[:, pl.ds(j, 1), :]
        row1 = a_ref[pl.ds(j, 1), :, :]
        c1 = jnp.where(rows > j, col1 * inv1, 0.0)
        ct1 = jnp.where(cols > j, row1 * inv1, 0.0)
        a12 = a_ref[pl.ds(j, 1), pl.ds(j + 1, 1), :]
        l12 = a12 * inv1
        col2 = a_ref[:, pl.ds(j + 1, 1), :] - c1 * l12
        row2 = a_ref[pl.ds(j + 1, 1), :, :] - l12 * ct1
        d2 = a_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :] - l12 * l12
        inv2 = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
        c2 = jnp.where(rows > j + 1, col2 * inv2, 0.0)
        ct2 = jnp.where(cols > j + 1, row2 * inv2, 0.0)
        return d1, inv1, c1, ct1, d2, inv2, c2, ct2

    def left_step(q, carry):
        j = 2 * q
        d1, inv1, c1, ct1, d2, inv2, c2, ct2 = pair_cols(j)
        ct1l, ct2l = ct1[:, :h], ct2[:, :h]
        for r in range(k // RP):
            @pl.when(j < (r + 1) * RP)
            def _updl(r=r):
                sl = pl.ds(r * RP, RP)
                a_ref[sl, pl.ds(0, h), :] = (
                    a_ref[sl, pl.ds(0, h), :]
                    - c1[r * RP:(r + 1) * RP] * ct1l
                    - c2[r * RP:(r + 1) * RP] * ct2l)
        # A12 rows still to be read by later left passes (rows < h); the
        # A22 quadrant's corrections are deferred to the Schur phase
        ct1r, ct2r = ct1[:, h:], ct2[:, h:]
        for r in range(h // RP):
            @pl.when(j < (r + 1) * RP)
            def _updr(r=r):
                sl = pl.ds(r * RP, RP)
                a_ref[sl, pl.ds(h, h), :] = (
                    a_ref[sl, pl.ds(h, h), :]
                    - c1[r * RP:(r + 1) * RP] * ct1r
                    - c2[r * RP:(r + 1) * RP] * ct2r)
        a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, d1 * inv1, c1)
        a_ref[:, pl.ds(j + 1, 1), :] = jnp.where(rows == j + 1,
                                                 d2 * inv2, c2)
        # stash L21^T rows in the rows' own dead A12 slots (row j's [h:]
        # segment was read for the last time this pass)
        a_ref[pl.ds(j, 1), pl.ds(h, h), :] = ct1r
        a_ref[pl.ds(j + 1, 1), pl.ds(h, h), :] = ct2r
        return carry

    jax.lax.fori_loop(0, h // 2, left_step, 0, unroll=False)

    GW = 8

    def schur_step(g, carry):
        p0 = g * GW
        col = a_ref[:, pl.ds(p0, 1), :]
        lt = a_ref[pl.ds(p0, 1), pl.ds(h, h), :]
        upd = col[h:] * lt
        for i in range(1, GW):
            col = a_ref[:, pl.ds(p0 + i, 1), :]
            lt = a_ref[pl.ds(p0 + i, 1), pl.ds(h, h), :]
            upd = upd + col[h:] * lt
        a_ref[pl.ds(h, h), pl.ds(h, h), :] = (
            a_ref[pl.ds(h, h), pl.ds(h, h), :] - upd)
        return carry

    jax.lax.fori_loop(0, h // GW, schur_step, 0, unroll=False)

    def right_step(q, carry):
        j = h + 2 * q
        d1, inv1, c1, ct1, d2, inv2, c2, ct2 = pair_cols(j)
        ct1r, ct2r = ct1[:, h:], ct2[:, h:]
        for r in range(h // RP, k // RP):
            @pl.when(j < (r + 1) * RP)
            def _upd(r=r):
                sl = pl.ds(r * RP, RP)
                a_ref[sl, pl.ds(h, h), :] = (
                    a_ref[sl, pl.ds(h, h), :]
                    - c1[r * RP:(r + 1) * RP] * ct1r
                    - c2[r * RP:(r + 1) * RP] * ct2r)
        # full-column writes also zero the stashed L21^T rows (rows < h of
        # column j), leaving clean lower-triangular L for the substitutions
        a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, d1 * inv1, c1)
        a_ref[:, pl.ds(j + 1, 1), :] = jnp.where(rows == j + 1,
                                                 d2 * inv2, c2)
        return carry

    jax.lax.fori_loop(0, h // 2, right_step, 0, unroll=False)


def _factor_body_pair_multi(a_refs):
    """Pair factorization over SEVERAL independent (k, k, hb) blocks with
    their loop bodies fused: one fori_loop whose body emits each half's
    rsqrt -> scale -> RMW chain back to back, giving the VLIW scheduler
    independent dependency chains to overlap. Tests the latency-bound
    hypothesis of docs/PERF.md's rank-128 anatomy (the factor runs at ~25%
    VPU utilization; per-pass time ~4x the elementwise cost). Lane width
    drops to hb (<128), so every op is under-utilized lane-wise — whether
    chain overlap beats lane occupancy is a measured question."""
    k = a_refs[0].shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    RP = 8

    def pair_step(q, carry):
        j = 2 * q
        cs = []
        for a_ref in a_refs:
            d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
            inv1 = jax.lax.rsqrt(jnp.maximum(d1, 1e-30))
            col1 = a_ref[:, pl.ds(j, 1), :]
            row1 = a_ref[pl.ds(j, 1), :, :]
            c1 = jnp.where(rows > j, col1 * inv1, 0.0)
            ct1 = jnp.where(cols > j, row1 * inv1, 0.0)
            a12 = a_ref[pl.ds(j, 1), pl.ds(j + 1, 1), :]
            l12 = a12 * inv1
            col2 = a_ref[:, pl.ds(j + 1, 1), :] - c1 * l12
            row2 = a_ref[pl.ds(j + 1, 1), :, :] - l12 * ct1
            d2 = a_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :] - l12 * l12
            inv2 = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
            c2 = jnp.where(rows > j + 1, col2 * inv2, 0.0)
            ct2 = jnp.where(cols > j + 1, row2 * inv2, 0.0)
            cs.append((d1, inv1, c1, ct1, d2, inv2, c2, ct2))
        for r in range(k // RP):
            @pl.when(j < (r + 1) * RP)
            def _upd(r=r):
                sl = pl.ds(r * RP, RP)
                for a_ref, (d1, inv1, c1, ct1, d2, inv2, c2, ct2) in zip(
                        a_refs, cs):
                    a_ref[sl, :, :] = (a_ref[sl, :, :]
                                       - c1[r * RP:(r + 1) * RP] * ct1
                                       - c2[r * RP:(r + 1) * RP] * ct2)
        for a_ref, (d1, inv1, c1, ct1, d2, inv2, c2, ct2) in zip(a_refs, cs):
            a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, d1 * inv1, c1)
            a_ref[:, pl.ds(j + 1, 1), :] = jnp.where(rows == j + 1,
                                                     d2 * inv2, c2)
        return carry

    jax.lax.fori_loop(0, k // 2, pair_step, 0, unroll=False)


def _substitutions_pair_multi(a_refs, rhs_ref, out_ref, y_refs, x_refs):
    """Pairwise substitutions over several independent lane-halves, loop
    bodies fused (see _factor_body_pair_multi). rhs_ref/out_ref stay full
    (k, bt) blocks: half h reads lane slice [h*hb, (h+1)*hb) of each rhs
    row as a VALUE slice, and the solution rows are reassembled by lane
    concatenation on the out writes (Mosaic block/ref lane dims must be
    128-divisible, so the halves cannot be separate operands)."""
    k, _, hb = a_refs[0].shape
    n = len(a_refs)
    bt = n * hb

    for y_ref in y_refs:
        y_ref[:] = jnp.zeros((1, k, hb), jnp.float32)

    def fwd_step(q, carry):
        j = 2 * q
        r1_full = jnp.reshape(rhs_ref[pl.ds(j, 1), :], (1, 1, bt))
        r2_full = jnp.reshape(rhs_ref[pl.ds(j + 1, 1), :], (1, 1, bt))
        for h, (a_ref, y_ref) in enumerate(zip(a_refs, y_refs)):
            row1 = a_ref[pl.ds(j, 1), :, :]
            row2 = a_ref[pl.ds(j + 1, 1), :, :]
            y = y_ref[:]
            s1 = jnp.sum(row1 * y, axis=1, keepdims=True)
            s2 = jnp.sum(row2 * y, axis=1, keepdims=True)
            d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
            d2 = a_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :]
            l21 = a_ref[pl.ds(j + 1, 1), pl.ds(j, 1), :]
            r1 = jax.lax.slice(r1_full, (0, 0, h * hb), (1, 1, (h + 1) * hb))
            r2 = jax.lax.slice(r2_full, (0, 0, h * hb), (1, 1, (h + 1) * hb))
            v1 = (r1 - s1) / jnp.maximum(d1, 1e-30)
            v2 = (r2 - s2 - l21 * v1) / jnp.maximum(d2, 1e-30)
            y_ref[:, pl.ds(j, 1), :] = v1
            y_ref[:, pl.ds(j + 1, 1), :] = v2
        return carry

    jax.lax.fori_loop(0, k // 2, fwd_step, 0, unroll=False)

    for x_ref in x_refs:
        x_ref[:] = jnp.zeros((k, 1, hb), jnp.float32)

    def bwd_step(t, carry):
        j = k - 1 - 2 * t
        v1s, v2s = [], []
        for h, (a_ref, y_ref, x_ref) in enumerate(zip(a_refs, y_refs,
                                                      x_refs)):
            col1 = a_ref[:, pl.ds(j, 1), :]
            col2 = a_ref[:, pl.ds(j - 1, 1), :]
            x = x_ref[:]
            s1 = jnp.sum(col1 * x, axis=0, keepdims=True)
            s2 = jnp.sum(col2 * x, axis=0, keepdims=True)
            d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
            d2 = a_ref[pl.ds(j - 1, 1), pl.ds(j - 1, 1), :]
            l = a_ref[pl.ds(j, 1), pl.ds(j - 1, 1), :]
            y1 = y_ref[:, pl.ds(j, 1), :]
            y2 = y_ref[:, pl.ds(j - 1, 1), :]
            v1 = (y1 - s1) / jnp.maximum(d1, 1e-30)
            v2 = (y2 - s2 - l * v1) / jnp.maximum(d2, 1e-30)
            x_ref[pl.ds(j, 1), :, :] = v1
            x_ref[pl.ds(j - 1, 1), :, :] = v2
            v1s.append(v1)
            v2s.append(v2)
        out_ref[pl.ds(j, 1), :] = jnp.reshape(
            jnp.concatenate(v1s, axis=2), (1, bt))
        out_ref[pl.ds(j - 1, 1), :] = jnp.reshape(
            jnp.concatenate(v2s, axis=2), (1, bt))
        return carry

    jax.lax.fori_loop(0, k // 2, bwd_step, 0, unroll=False)


def _cholesky_solve_kernel_dual(g_ref, rhs_ref, reg_ref, out_ref,
                                a0_ref, a1_ref, y0_ref, y1_ref,
                                x0_ref, x1_ref):
    """Dual-chain variant: the (k, k, bt) block is split into two lane
    halves factored INTERLEAVED (one fused loop body -> two independent
    serial chains). The split/merge are VALUE lane slices/concats (Mosaic
    forbids sub-128 lane blocks); same total VMEM as the single-chain
    kernel plus the halved y/x scratch."""
    k = g_ref.shape[0]
    bt = g_ref.shape[2]
    hb = a0_ref.shape[2]
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    eye = jnp.where(ri == ci, 1.0, 0.0)
    g = g_ref[:].astype(jnp.float32) + eye * reg_ref[:][None]
    a0_ref[:] = jax.lax.slice(g, (0, 0, 0), (k, k, hb))
    a1_ref[:] = jax.lax.slice(g, (0, 0, hb), (k, k, bt))
    _factor_body_pair_multi((a0_ref, a1_ref))
    _substitutions_pair_multi((a0_ref, a1_ref), rhs_ref, out_ref,
                              (y0_ref, y1_ref), (x0_ref, x1_ref))


def _cholesky_solve_kernel_schur(subs2, g_ref, rhs_ref, reg_ref, out_ref,
                                 a_ref, y_ref, x_ref):
    """Rank-1 kernel wrapper around the two-level Schur factor body."""
    k, _, bt = a_ref.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    a_ref[:] = (g_ref[:].astype(jnp.float32)
                + jnp.where(ri == ci, 1.0, 0.0) * reg_ref[:][None])
    _factor_body_schur(a_ref)
    (_substitutions_pair if subs2 else _substitutions)(
        a_ref, rhs_ref, out_ref, y_ref, x_ref)


def _factor_solve_body(a_ref, rhs_ref, out_ref, y_ref, x_ref, pair=False,
                       subs2=False):
    """Shared rank-1 factorization + substitutions over a loaded A block."""
    subs = _substitutions_pair if subs2 else _substitutions
    if pair:
        _factor_body_pair(a_ref)
        subs(a_ref, rhs_ref, out_ref, y_ref, x_ref)
        return
    k, _, bt = a_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)

    # ---- factorization: k rank-1 steps, all lane-parallel over the batch --
    # The rank-1 update only NUMERICALLY touches the trailing (row>j, col>j)
    # block: c is masked to rows>j and ct to cols>j, so their outer product
    # is zero elsewhere. Skipping row panels entirely at or below j is
    # therefore exact — and halves the update work (the kernel's dominant
    # cost) on average. Panels are static 8-row slabs guarded by @pl.when.
    RP = 8
    def fact_step(j, carry):
        d = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]                  # (1, 1, bt)
        inv_s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
        col = a_ref[:, pl.ds(j, 1), :]                          # (k, 1, bt)
        row = a_ref[pl.ds(j, 1), :, :]                          # (1, k, bt)
        c = jnp.where(rows > j, col * inv_s, 0.0)               # L[j+1:, j]
        ct = jnp.where(cols > j, row * inv_s, 0.0)              # its transpose
        for r in range(k // RP):
            @pl.when(j < (r + 1) * RP)
            def _upd(r=r):
                sl = pl.ds(r * RP, RP)
                a_ref[sl, :, :] = (a_ref[sl, :, :]
                                   - c[r * RP:(r + 1) * RP] * ct)
        a_ref[:, pl.ds(j, 1), :] = jnp.where(rows == j, d * inv_s, c)
        return carry

    jax.lax.fori_loop(0, k, fact_step, 0, unroll=False)
    subs(a_ref, rhs_ref, out_ref, y_ref, x_ref)


def _substitutions_pair(a_ref, rhs_ref, out_ref, y_ref, x_ref):
    """Substitutions, TWO rows/columns per pass: halves the 2k serial
    passes; the intra-pair dependency is one single-element ref read
    (L[j+1, j]) — the same no-dynamic-value-slicing trick as the pair
    factor step.  The two k-wide running inner products per pass are
    dependency-free, so each pass is ~as fast as a rank-1 pass.

    NOT bitwise identical to the rank-1 substitutions (unlike the pair
    FACTOR step, which is — verified on device via
    scripts/probe_solve_variants.py's bitwise check): the cross term is
    subtracted after the k-wide reduction instead of entering it as a
    leaf, so the f32 association differs by ulps. Same exact algorithm;
    parity holds at the oracle tolerances. Isolated k=128: 70.6 -> 64.0
    ms per 65k systems (-9%)."""
    k, _, bt = a_ref.shape

    y_ref[:] = jnp.zeros((1, k, bt), jnp.float32)

    def fwd_step(q, carry):
        j = 2 * q
        row1 = a_ref[pl.ds(j, 1), :, :]
        row2 = a_ref[pl.ds(j + 1, 1), :, :]
        y = y_ref[:]
        s1 = jnp.sum(row1 * y, axis=1, keepdims=True)
        s2 = jnp.sum(row2 * y, axis=1, keepdims=True)
        d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        d2 = a_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :]
        l21 = a_ref[pl.ds(j + 1, 1), pl.ds(j, 1), :]
        r1 = jnp.reshape(rhs_ref[pl.ds(j, 1), :], (1, 1, bt))
        r2 = jnp.reshape(rhs_ref[pl.ds(j + 1, 1), :], (1, 1, bt))
        v1 = (r1 - s1) / jnp.maximum(d1, 1e-30)
        v2 = (r2 - s2 - l21 * v1) / jnp.maximum(d2, 1e-30)
        y_ref[:, pl.ds(j, 1), :] = v1
        y_ref[:, pl.ds(j + 1, 1), :] = v2
        return carry

    jax.lax.fori_loop(0, k // 2, fwd_step, 0, unroll=False)

    x_ref[:] = jnp.zeros((k, 1, bt), jnp.float32)

    def bwd_step(t, carry):
        j = k - 1 - 2 * t
        col1 = a_ref[:, pl.ds(j, 1), :]
        col2 = a_ref[:, pl.ds(j - 1, 1), :]
        x = x_ref[:]
        s1 = jnp.sum(col1 * x, axis=0, keepdims=True)
        s2 = jnp.sum(col2 * x, axis=0, keepdims=True)
        d1 = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        d2 = a_ref[pl.ds(j - 1, 1), pl.ds(j - 1, 1), :]
        l = a_ref[pl.ds(j, 1), pl.ds(j - 1, 1), :]     # L[j, j-1]
        y1 = y_ref[:, pl.ds(j, 1), :]
        y2 = y_ref[:, pl.ds(j - 1, 1), :]
        v1 = (y1 - s1) / jnp.maximum(d1, 1e-30)
        v2 = (y2 - s2 - l * v1) / jnp.maximum(d2, 1e-30)
        x_ref[pl.ds(j, 1), :, :] = v1
        x_ref[pl.ds(j - 1, 1), :, :] = v2
        out_ref[pl.ds(j, 1), :] = jnp.reshape(v1, (1, bt))
        out_ref[pl.ds(j - 1, 1), :] = jnp.reshape(v2, (1, bt))
        return carry

    jax.lax.fori_loop(0, k // 2, bwd_step, 0, unroll=False)


def _substitutions(a_ref, rhs_ref, out_ref, y_ref, x_ref):
    """Forward + backward substitution against a factored A block."""
    k, _, bt = a_ref.shape

    # ---- forward substitution: L y = rhs (y is (1, k, BT)) ----------------
    y_ref[:] = jnp.zeros((1, k, bt), jnp.float32)

    def fwd_step(j, carry):
        row = a_ref[pl.ds(j, 1), :, :]                          # (1, k, bt)
        s = jnp.sum(row * y_ref[:], axis=1, keepdims=True)      # (1, 1, bt)
        d = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        rj = jnp.reshape(rhs_ref[pl.ds(j, 1), :], (1, 1, bt))
        y_ref[:, pl.ds(j, 1), :] = (rj - s) / jnp.maximum(d, 1e-30)
        return carry

    jax.lax.fori_loop(0, k, fwd_step, 0, unroll=False)

    # ---- backward substitution: L^T x = y (x is (k, 1, BT)) ---------------
    x_ref[:] = jnp.zeros((k, 1, bt), jnp.float32)

    def bwd_step(t, carry):
        j = k - 1 - t
        col = a_ref[:, pl.ds(j, 1), :]                          # L[:, j]
        s = jnp.sum(col * x_ref[:], axis=0, keepdims=True)      # (1, 1, bt)
        d = a_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        yj = y_ref[:, pl.ds(j, 1), :]
        v = (yj - s) / jnp.maximum(d, 1e-30)
        x_ref[pl.ds(j, 1), :, :] = v
        out_ref[pl.ds(j, 1), :] = jnp.reshape(v, (1, bt))
        return carry

    jax.lax.fori_loop(0, k, bwd_step, 0, unroll=False)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "panel", "pair", "schur",
                                    "subs2", "dual"))
def _cholesky_solve_t(Gt: jnp.ndarray, rhst: jnp.ndarray, regv: jnp.ndarray,
                      interpret: bool = False,
                      panel: bool = False,
                      pair: bool = True,
                      schur: bool = False,
                      subs2: bool = True,
                      dual: bool = False,
                      Gt2: jnp.ndarray = None) -> jnp.ndarray:
    """Batch-minor entry: Gt (k, k, B) (ridge NOT yet added), rhst (k, B),
    regv (1, B) per-system ridge -> x (k, B).

    ``Gt2``: optional second (k, k, B) gram term summed with Gt in VMEM on
    load (see _cholesky_solve_kernel_2g). Forces panel=False.

    B must already be a multiple of the block size.
    """
    k, _, b = Gt.shape
    bt = _block_batch(k)
    if Gt2 is not None:
        # two double-buffered (k, k, bt) operands + the factorization
        # scratch must fit the ~16 MB scoped-vmem check (the check applies
        # even with vmem_limit_bytes raised, measured) — halve the block
        # (8-aligned: callers pad the batch to sublane multiples, and a
        # non-multiple-of-8 block could no longer span it exactly).
        # NOTE: this costs ~40% solve time vs one operand (k sequential
        # factorization steps per block run twice as often); the ALS sweep
        # therefore folds its hot-column gram via the gram scan's initial
        # carry instead of this operand (solver/als_sweep.py).
        bt = max(bt // 2 // 8 * 8, 8)
    bt = min(bt, b)
    if b % bt:
        # a floored grid would return systems past the last full block as
        # UNINITIALIZED output memory (r4 review) — make the documented
        # contract loud
        raise ValueError(
            f"batch {b} must be a multiple of the block {bt} "
            "(pad with identity systems; see cholesky_solve)")
    grid = (b // bt,)
    # Inside shard_map the output must declare how it varies over mesh axes
    # (it varies exactly like the inputs: each shard solves its own systems).
    vma = frozenset(getattr(jax.typeof(Gt), "vma", ()) or ())
    vma = vma | frozenset(getattr(jax.typeof(rhst), "vma", ()) or ())
    if vma:
        out_shape = jax.ShapeDtypeStruct((k, b), jnp.float32, vma=vma)
        regv = jax.lax.pcast(regv, tuple(vma), to="varying") \
            if not getattr(jax.typeof(regv), "vma", None) else regv
    else:
        out_shape = jax.ShapeDtypeStruct((k, b), jnp.float32)
    g_spec = pl.BlockSpec((k, k, bt), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((k, k, bt), jnp.float32),
        pltpu.VMEM((1, k, bt), jnp.float32),
        pltpu.VMEM((k, 1, bt), jnp.float32),
    ]
    if Gt2 is not None:
        if dual:
            raise ValueError("dual variant has no two-operand form")
        kernel = functools.partial(_cholesky_solve_kernel_2g, subs2)
        operands = (Gt, Gt2, rhst, regv)
        g_specs = [g_spec, g_spec]
    else:
        if dual:
            if b % bt or bt % 2:
                raise ValueError(f"dual variant needs b % bt == 0, bt "
                                 f"even; got b={b}, bt={bt}")
            hb = bt // 2
            kernel = _cholesky_solve_kernel_dual
            scratch = [pltpu.VMEM(s, jnp.float32)
                       for s in ((k, k, hb), (k, k, hb), (1, k, hb),
                                 (1, k, hb), (k, 1, hb), (k, 1, hb))]
        elif schur:
            if k % 16:
                raise ValueError(f"schur variant requires k % 16 == 0, "
                                 f"got k={k}")
            kernel = functools.partial(_cholesky_solve_kernel_schur, subs2)
        elif panel:
            kernel = _cholesky_solve_kernel_panel
            scratch = scratch + [
                pltpu.VMEM((k, 8, bt), jnp.float32),   # panel columns c
                pltpu.VMEM((8, k, bt), jnp.float32),   # panel rows c^T
            ]
        else:
            kernel = functools.partial(
                _cholesky_solve_kernel_pair if pair
                else _cholesky_solve_kernel, subs2)
        operands = (Gt, rhst, regv)
        g_specs = [g_spec]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=g_specs + [
            pl.BlockSpec((k, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * k * b + 4 * k * k * b,
            bytes_accessed=((2 if Gt2 is not None else 1) * k * k * b
                            + 3 * k * b) * 4,
            transcendentals=k * b,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("alpha", "interpret", "subs2"))
def _cholesky_solve_t_hot(Gt: jnp.ndarray, rhst: jnp.ndarray,
                          regv: jnp.ndarray, hvT: jnp.ndarray,
                          vT: jnp.ndarray,
                          alpha=None, interpret: bool = False,
                          subs2: bool = True) -> jnp.ndarray:
    """Batch-minor entry with fused hot-column contribution.

    Gt (k, k, B) gathered gram (no ridge), rhst (k, B), regv (1, B),
    hvT (C, B) bf16 hot-column values (0 = unobserved), vT (k, C) f32 hot
    factor rows (already rounded to the compute dtype — the kernel builds
    the exact outer-product table from them in VMEM).
    ``alpha``: static implicit-feedback confidence (None = explicit).
    B must be a multiple of the block size.
    """
    k, _, b = Gt.shape
    c = hvT.shape[0]
    if c > hot_cols_cap(k):
        raise ValueError(
            f"hot block C={c} exceeds the fused kernel's VMEM budget at "
            f"k={k}; cap with hot_cols_cap(k)={hot_cols_cap(k)}")
    bt = min(_block_batch(k), b)
    if b % bt:
        raise ValueError(
            f"batch {b} must be a multiple of the block {bt} "
            "(pad with identity systems; see solve_spd_t_hot)")
    grid = (b // bt,)
    vma = frozenset(getattr(jax.typeof(Gt), "vma", ()) or ())
    vma = vma | frozenset(getattr(jax.typeof(rhst), "vma", ()) or ())
    if vma:
        out_shape = jax.ShapeDtypeStruct((k, b), jnp.float32, vma=vma)
        # inside shard_map an UNVARYING operand (e.g. the constant reg
        # vector the sweep builds with jnp.full, and the replicated hot
        # factor rows) must be pcast to varying to match the declared out
        # vma — the non-hot wrapper has carried this since the shard_map
        # port; its absence HERE crashed the default-config sharded TPU
        # fit (hot columns + allgather — r4 review finding 1)
        regv = jax.lax.pcast(regv, tuple(vma), to="varying") \
            if not getattr(jax.typeof(regv), "vma", None) else regv
        hvT = jax.lax.pcast(hvT, tuple(vma), to="varying") \
            if not getattr(jax.typeof(hvT), "vma", None) else hvT
        vT = jax.lax.pcast(vT, tuple(vma), to="varying") \
            if not getattr(jax.typeof(vT), "vma", None) else vT
    else:
        out_shape = jax.ShapeDtypeStruct((k, b), jnp.float32)
    return pl.pallas_call(
        functools.partial(_cholesky_solve_kernel_hot, alpha, 0.0, bt, subs2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # G streamed by manual DMA
            pl.BlockSpec((c, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((k, k, bt), jnp.float32),
            pltpu.VMEM((1, k, bt), jnp.float32),
            pltpu.VMEM((k, 1, bt), jnp.float32),
            pltpu.VMEM((k, k, c), jnp.float32),   # outer-product table
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * k * b + 4 * k * k * b + 2 * k * k * c * b,
            bytes_accessed=(k * k * b + 3 * k * b) * 4 + c * b * 2,
            transcendentals=k * b,
        ),
        interpret=interpret,
    )(Gt, hvT, vT, rhst, regv)


def cholesky_solve_flat(G_flat: jnp.ndarray, rhs: jnp.ndarray, k: int,
                        reg_vec=None, panel: bool = False) -> jnp.ndarray:
    """Like :func:`cholesky_solve` but takes the systems FLAT: G_flat
    (B, k*k) row-major. The flat form has no XLA tile padding (a (B, k, k)
    f32 array pads its minor k dim up to 128 lanes — 2x memory for k=64),
    and transposing (B, k*k) -> (k*k, B) then reshaping to the kernel's
    batch-minor (k, k, B) is free of padded intermediates. Requires k % 8
    == 0 (else fall back to the shaped API).

    ``reg_vec`` (B,) adds a per-system ridge INSIDE the kernel (fused with
    the load — no extra whole-array pass). Pass systems already SPD (or a
    positive reg_vec).
    """
    b = G_flat.shape[0]
    if b == 0:
        return jnp.zeros((0, k), jnp.float32)
    assert k % 8 == 0, "flat path requires sublane-aligned k"
    if not pallas_supported(k, b):
        raise ValueError(
            f"k={k}, b={b}: multi-block grids need <=160-wide systems "
            f"(Mosaic lane limit) — use ops.solve with solver='auto'")
    interpret = _use_interpret()
    bt = _block_batch(k)
    bp = -(-b // bt) * bt
    Gt = jnp.transpose(G_flat, (1, 0)).reshape(k, k, b)
    rhst = jnp.transpose(rhs, (1, 0)).astype(jnp.float32)
    if reg_vec is None:
        regv = jnp.zeros((1, b), jnp.float32)
    else:
        regv = jnp.asarray(reg_vec, jnp.float32).reshape(1, b)
    if bp != b:
        eye = jnp.eye(k, dtype=Gt.dtype)
        Gt = jnp.pad(Gt, ((0, 0), (0, 0), (0, bp - b)))
        Gt = Gt + eye[:, :, None] * (jnp.arange(bp) >= b)[None, None, :
                                                          ].astype(Gt.dtype)
        rhst = jnp.pad(rhst, ((0, 0), (0, bp - b)))
        regv = jnp.pad(regv, ((0, 0), (0, bp - b)))
    x = _cholesky_solve_t(Gt, rhst, regv, interpret=interpret, panel=panel)
    return jnp.transpose(x[:, :b], (1, 0))


def cholesky_solve(G: jnp.ndarray, rhs: jnp.ndarray,
                   panel: bool = False) -> jnp.ndarray:
    """Solve ``G x = rhs`` for a batch of SPD systems via one fused kernel.

    G: (B, k, k) float32 (ridge already added), rhs: (B, k) -> x: (B, k).
    Drop-in replacement for the 'xla' path in ``ops.solve.solve_spd``.

    ``panel=True`` selects the rank-8 panel factorization. Measured on v5e
    it is ~1.5x SLOWER than the rank-1 kernel (5.3 vs 3.6 ms at B=8192,
    k=64): the factorization is not VMEM-bandwidth-bound, so the saved
    read-modify-write passes don't pay for the extra masked reduces and
    panel-scratch traffic. Kept as an option/reference.
    """
    b, k, _ = G.shape
    if b == 0:
        return jnp.zeros((0, k), jnp.float32)
    if not pallas_supported(k, b):
        raise ValueError(
            f"k={k}, b={b}: multi-block grids need <=160-wide systems "
            f"(Mosaic lane limit) — use ops.solve with solver='auto'")
    interpret = _use_interpret()

    kp = -(-k // 8) * 8
    bt = _block_batch(kp)
    bp = -(-b // bt) * bt
    Gt = jnp.transpose(G, (1, 2, 0)).astype(jnp.float32)
    rhst = jnp.transpose(rhs, (1, 0)).astype(jnp.float32)
    eye = jnp.eye(kp, dtype=jnp.float32)
    if kp != k:
        # extend with an identity diagonal: keeps SPD, solves to x_pad = 0
        Gt = jnp.pad(Gt, ((0, kp - k), (0, kp - k), (0, 0)))
        Gt = Gt + (eye * (jnp.arange(kp) >= k)[:, None])[..., None]
        rhst = jnp.pad(rhst, ((0, kp - k), (0, 0)))
    if bp != b:
        # pad batch with identity systems (rhs 0 -> x 0)
        Gt = jnp.pad(Gt, ((0, 0), (0, 0), (0, bp - b)))
        Gt = Gt + eye[:, :, None] * (jnp.arange(bp) >= b)[None, None, :]
        rhst = jnp.pad(rhst, ((0, 0), (0, bp - b)))

    x = _cholesky_solve_t(Gt, rhst, jnp.zeros((1, bp), jnp.float32),
                          interpret=interpret, panel=panel)
    return jnp.transpose(x[:k, :b], (1, 0))


__all__ = ["cholesky_solve", "cholesky_solve_flat", "block_batch"]
