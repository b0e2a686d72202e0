"""End-to-end CI lane for the bench harness (VERDICT r2 item 1c).

Round 2 recorded NO perf artifact because bench.py's retry ladder had no
global deadline and its CPU fallback crashed on first JAX use (the
config-update-only platform force is proven broken in this image).  These
tests run the real parent->child->JSON path in subprocesses on tiny shapes
and assert the repo invariant: **exactly one parseable JSON line on
stdout**, whatever the backend weather.
"""
import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

TINY = {
    "_BENCH_CPU_BLOCK": "16384",
    "_BENCH_CPU_FRAMES": "8",
}


def _run(env_extra, timeout=420):
    env = dict(os.environ, **env_extra)
    # the suite conftest forces cpu via in-process config; subprocesses
    # must make their own platform choice (that is what's under test)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)


def _assert_one_json_line(out):
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout not one line: {out.stdout!r}"
    rec = json.loads(lines[0])
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in rec, f"missing key {k}: {rec}"
    return rec


@pytest.mark.slow
def test_cpu_fallback_child_end_to_end():
    """_BENCH_CHILD=cpu must force the host-CPU backend before first JAX
    use and print one decode-verified JSON line (live-repro regression:
    VERDICT r2 weak #2, UNIMPLEMENTED at iqfmt device_get_c64)."""
    out = _run(dict(TINY, _BENCH_CHILD="cpu"))
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _assert_one_json_line(out)
    assert rec["correct"] is True
    assert rec["device"] == "cpu"
    assert rec["dispatch"] == "cpu_fallback"
    assert rec["value"] > 0
    assert rec["frames_verified"] > 0


@pytest.mark.slow
def test_parent_deadline_forces_fallback_json_line():
    """With an already-expired deadline the parent must skip every TPU
    tier and still print exactly one JSON line via the CPU fallback —
    whose note must state the TRUE cause (no attempt was made), not the
    old hardcoded health-gate story (VERDICT r3 weak #2)."""
    out = _run(dict(TINY, BENCH_DEADLINE_S="1"))
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _assert_one_json_line(out)
    assert rec["dispatch"] == "cpu_fallback"
    assert rec["correct"] is True
    assert "no TPU attempt was made" in rec["note"]


@pytest.mark.slow
def test_fallback_note_reports_actual_attempt_reasons():
    """When TPU attempts DID fail, the fallback JSON must carry the
    per-attempt causes the parent recorded (gate fail vs timeout vs
    exception), verbatim."""
    reasons = "best#1: health-gate fail; best#2: timeout(700s)"
    out = _run(dict(TINY, _BENCH_CHILD="cpu",
                    _BENCH_TPU_ATTEMPTS=reasons))
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _assert_one_json_line(out)
    assert rec["dispatch"] == "cpu_fallback"
    assert reasons in rec["note"]


def test_session_capabilities_cpu_reports_both_tiers():
    """The capability triage the parent uses to pick its ladder: a
    complex-capable backend (the CPU here) must report both tiers."""
    from liquid_usrp_tpu.utils.tpu_session import session_capabilities
    caps = session_capabilities(120)
    assert caps == {"real": True, "complex": True}


@pytest.mark.slow
def test_planar_variant_decode_verified():
    """The planar tier (_bench_mcrx(planar=True)) must decode every
    injected frame payload-exact — same assertion machinery as the
    complex tiers, but through the planar transform."""
    sys.path.insert(0, os.path.dirname(BENCH))
    import bench
    metric, sps, extra = bench._bench_mcrx(
        block_size=16384, max_frames=8, scan=1, batched_blocks=2,
        planar=True)
    assert metric == "mcrx_iq_throughput"
    assert extra["correct"] is True
    assert extra["frames_verified"] > 0
    assert sps > 0
