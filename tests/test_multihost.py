"""Multi-host tests: 2-process jax.distributed CPU mesh (SURVEY.md §4.2-6)
plus fault injection -> restart-from-checkpoint recovery (§5 'Failure
detection / elastic recovery').

Each test launches real subprocesses running tests/multihost_worker.py with
`jax.distributed.initialize` over localhost; the global mesh is 2 processes
x 4 virtual CPU devices. Marked slow-ish (~1 min total); processes are
killed by exact PID on timeout, never by pattern.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env_cpu_only():
    """Worker env: repo importable, TPU plugins unregistered (the axon plugin
    ignores JAX_PLATFORMS, so it must not be importable at all)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # worker sets its own
    keep = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([_REPO, *keep])
    return env


def _launch(coordinator, n_procs, proc_id, outdir, extra=()):
    env = _env_cpu_only()
    return subprocess.Popen(
        [sys.executable, _WORKER, coordinator, str(n_procs), str(proc_id),
         str(outdir), *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _run_all(outdir, extra=(), timeout=240, expect_rc=(0, 0)):
    coordinator = f"localhost:{_free_port()}"
    procs = [_launch(coordinator, 2, i, outdir, extra) for i in range(2)]
    outs = []
    try:
        for p, want in zip(procs, expect_rc):
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            assert p.returncode == want, f"rc={p.returncode}\n{out}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()                 # exact PID only
                p.communicate()
    return outs


@pytest.fixture(scope="module")
def single_process_reference(tmp_path_factory):
    """The same problem fit in ONE process on an 8-device mesh (the worker's
    deterministic problem + init), for cross-process-count invariance."""
    out = tmp_path_factory.mktemp("ref")
    env = _env_cpu_only()
    # run the worker with 1 process and 8 local devices -> identical global mesh
    coordinator = f"localhost:{_free_port()}"
    p = subprocess.Popen(
        [sys.executable, _WORKER, coordinator, "1", "0", str(out)],
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        o, _ = p.communicate(timeout=240)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, o
    return np.load(out / "result.npz")


def test_two_process_fit_matches_single(tmp_path, single_process_reference):
    """2-proc x 4-dev result == 1-proc x 8-dev result (process-count
    invariance of the sharded program)."""
    outs = _run_all(tmp_path)
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


def test_two_process_scanned_fit_matches_single(tmp_path,
                                                single_process_reference):
    """The scanned whole-fit program (make_fit: one jitted lax.scan over
    sweeps, zero per-sweep host readbacks — VERDICT r3 task 3) is
    process-count invariant under real jax.distributed, and its riding
    SSE matches the stepwise train_sse reference."""
    outs = _run_all(tmp_path, extra=("--scanned",))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


def test_fault_injection_restart_resume(tmp_path, single_process_reference):
    """Kill the job after sweep 2 (os._exit mid-training), then restart both
    processes with --resume: the resumed run must finish and reproduce the
    uninterrupted result."""
    # phase 1: crash after sweep 2 (both workers exit 17 by design)
    _run_all(tmp_path, extra=("--crash-after-sweep", "2"),
             expect_rc=(17, 17))
    assert os.path.isdir(tmp_path / "ckpt"), "no checkpoint written pre-crash"
    assert not (tmp_path / "result.npz").exists()
    # phase 2: restart-resume from the latest checkpoint
    _run_all(tmp_path, extra=("--resume",))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


@pytest.mark.parametrize("exchange", ["all_to_all", "hybrid"])
def test_two_process_compact_exchange(tmp_path, exchange):
    """The rotation exchange (per-rotation ppermute round-trips) and the
    hybrid head-psum variant are process-count invariant: 2-proc x 4-dev ==
    1-proc x 8-dev under REAL jax.distributed (cross-process ppermute/psum
    + make_array_from_callback placement)."""
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    env = _env_cpu_only()
    coordinator = f"localhost:{_free_port()}"
    p = subprocess.Popen(
        [sys.executable, _WORKER, coordinator, "1", "0", str(ref_dir),
         "--exchange", exchange],
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        o, _ = p.communicate(timeout=240)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, o
    ref = np.load(ref_dir / "result.npz")

    _run_all(tmp_path, extra=("--exchange", exchange))
    res = np.load(tmp_path / "result.npz")
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


def test_hybrid2d_two_process_fit_matches_single(tmp_path,
                                                 single_process_reference):
    """The observation-parallel 2-D program across a REAL process (DCN)
    boundary: 2 processes = 2 slices of 4 shards, gram psum over 'dcn'
    crossing processes. Must match the 1-proc 8-shard 1-D result (same
    deterministic problem/init as the other workers — slice decomposition
    must not change the answer)."""
    _run_all(tmp_path, extra=("--model", "hybrid2d"))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


def _run_single(outdir, extra=(), expect_rc=0, timeout=240):
    """One worker process (its --global-devices arg sets the device count)."""
    env = _env_cpu_only()
    coordinator = f"localhost:{_free_port()}"
    p = subprocess.Popen(
        [sys.executable, _WORKER, coordinator, "1", "0", str(outdir),
         *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        o, _ = p.communicate(timeout=timeout)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == expect_rc, f"rc={p.returncode}\n{o}"
    return o


def test_cross_mesh_shape_restore_resumes_fit(tmp_path,
                                              single_process_reference):
    """SURVEY.md §5 checkpoint row: a checkpoint written on an 8-device
    mesh resumes THE FIT on a different mesh shape (VERDICT r4 weak #4 —
    the claim in utils/checkpoint.py was never demonstrated).

    Phase 1: 1 process x 8 devices, crash after sweep 2 (checkpointing).
    Phase 2: 2 processes x 2 devices (4 global shards) resume the
    remaining sweeps from that checkpoint. The completed fit must match
    the uninterrupted 8-device reference (factors restore as host arrays;
    place_factors re-pads/re-places for the CURRENT shard count)."""
    _run_single(tmp_path, extra=("--crash-after-sweep", "2"), expect_rc=17)
    assert os.path.isdir(tmp_path / "ckpt")
    _run_all(tmp_path, extra=("--resume", "--global-devices", "4"))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


@pytest.mark.parametrize("exchange", ["allgather", "hybrid"])
def test_scanned_fit_crash_resume(tmp_path, single_process_reference,
                                  exchange):
    """Scan-mode fits (make_fit: whole fit = one lax.scan device program)
    survive fault injection (VERDICT r4 task 8 — only stepwise paths were
    fault-injected before): fit 2 sweeps as one scan, checkpoint, hard
    exit; resume re-places and runs the remaining sweeps as one more scan.
    Covered for the production allgather mode AND the hybrid compact
    exchange."""
    extra = ("--scanned", "--exchange", exchange)
    _run_all(tmp_path, extra=extra + ("--crash-after-sweep", "2"),
             expect_rc=(17, 17))
    assert os.path.isdir(tmp_path / "ckpt")
    assert not (tmp_path / "result.npz").exists()
    _run_all(tmp_path, extra=extra + ("--resume",))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


def test_hybrid2d_scanned_crash_resume(tmp_path, single_process_reference):
    """The 2-D observation-parallel topology's scan-mode fit with fault
    injection mid-run (VERDICT r4 task 8): crash after a 2-sweep scan,
    resume across the real process (DCN) boundary, match the uninterrupted
    1-D 8-shard reference."""
    extra = ("--model", "hybrid2d", "--scanned")
    _run_all(tmp_path, extra=extra + ("--crash-after-sweep", "2"),
             expect_rc=(17, 17))
    assert os.path.isdir(tmp_path / "ckpt")
    _run_all(tmp_path, extra=extra + ("--resume",))
    res = np.load(tmp_path / "result.npz")
    ref = single_process_reference
    np.testing.assert_allclose(res["U"], ref["U"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["V"], ref["V"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["sse"], ref["sse"], rtol=1e-3)


@pytest.fixture(scope="module")
def imc_single_reference(tmp_path_factory):
    """IMC: same problem fit in ONE process on an 8-device mesh."""
    out = tmp_path_factory.mktemp("imc_ref")
    env = _env_cpu_only()
    coordinator = f"localhost:{_free_port()}"
    p = subprocess.Popen(
        [sys.executable, _WORKER, coordinator, "1", "0", str(out),
         "--model", "imc"],
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        o, _ = p.communicate(timeout=240)
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()
    assert p.returncode == 0, o
    return np.load(out / "result.npz")


def test_imc_two_process_fit_matches_single(tmp_path, imc_single_reference):
    """Sharded IMC with make_array_from_callback placement is process-count
    invariant (SURVEY.md N8; round-1 gap: jnp.asarray placement was not)."""
    _run_all(tmp_path, extra=("--model", "imc"))
    res = np.load(tmp_path / "result.npz")
    ref = imc_single_reference
    np.testing.assert_allclose(res["W"], ref["W"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["H"], ref["H"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["obj"], ref["obj"], rtol=1e-3)


def test_imc_fault_injection_restart_resume(tmp_path, imc_single_reference):
    """Kill a 2-process IMC job after sweep 2, restart with --resume: the
    finished run reproduces the uninterrupted result."""
    _run_all(tmp_path, extra=("--model", "imc", "--crash-after-sweep", "2"),
             expect_rc=(17, 17))
    assert os.path.isdir(tmp_path / "ckpt")
    assert not (tmp_path / "result.npz").exists()
    _run_all(tmp_path, extra=("--model", "imc", "--resume"))
    res = np.load(tmp_path / "result.npz")
    ref = imc_single_reference
    np.testing.assert_allclose(res["W"], ref["W"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(res["obj"], ref["obj"], rtol=1e-3)
