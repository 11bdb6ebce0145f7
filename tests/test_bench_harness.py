"""Unit tests for bench.py's Harness — the budget/watchdog runner the
driver's scoreboard capture depends on (VERDICT r3 item 1; the round-4
relay-stall death mode).  No device work: steps are plain callables."""

from __future__ import annotations

import time

import jax
import pytest


@pytest.fixture()
def Harness():
    # importing bench redirects the global compilation-cache dir to the TPU
    # cache; restore the CPU test cache afterwards so later tests keep
    # their warm entries
    before = jax.config.jax_compilation_cache_dir
    import bench

    jax.config.update("jax_compilation_cache_dir", before)
    return bench.Harness


class TestHarness:
    def test_success_and_failure_isolation(self, Harness):
        H = Harness(budget_s=60.0, min_deadline_s=5.0)
        assert H.step("ok", 0.1, lambda: H.fields.update(a=1))
        assert not H.step("boom", 0.1, lambda: 1 / 0)
        assert H.fields == {"a": 1}
        assert "boom" in H.errors and "ZeroDivisionError" in H.errors["boom"]
        assert H.hung_step is None and H.skipped == []

    def test_budget_skip(self, Harness):
        H = Harness(budget_s=1e-6)  # budget already spent (0 = unlimited)
        ran = H.step("late", 10.0, lambda: H.fields.update(x=1))
        assert not ran and H.skipped == ["late"] and H.fields == {}

    def test_stall_abandons_step_but_continues_when_probe_ok(self, Harness):
        H = Harness(budget_s=60.0, min_deadline_s=0.5)
        H._probe_relay = lambda t: True  # relay healthy for new work

        def slow():
            time.sleep(3.0)
            H.fields["late_write"] = 1  # abandoned thread may still land

        assert not H.step("stall", 0.1, slow)
        assert "watchdog" in H.errors["stall"]
        assert H.hung_step is None  # probe ok -> keep scheduling
        assert H.step("after", 0.1, lambda: H.fields.update(b=2))
        assert H.fields.get("b") == 2
        time.sleep(3.5)  # the abandoned thread's write still arrives
        assert H.fields.get("late_write") == 1

    def test_wedged_runtime_stops_scheduling(self, Harness):
        H = Harness(budget_s=60.0, min_deadline_s=0.5)
        H._probe_relay = lambda t: False  # fresh dispatch also stalls

        def hang():
            time.sleep(30.0)

        assert not H.step("wedge", 0.1, hang)
        assert H.hung_step == "wedge"
        # everything after is accounted as skipped, instantly
        t0 = time.perf_counter()
        assert not H.step("next", 0.1, lambda: H.fields.update(c=3))
        assert time.perf_counter() - t0 < 0.5
        assert H.skipped == ["next"] and "c" not in H.fields

    def test_deadline_respects_remaining_budget(self, Harness):
        H = Harness(budget_s=1.0, min_deadline_s=500.0, grace_s=0.5)
        H._probe_relay = lambda t: True
        t0 = time.perf_counter()
        assert not H.step("slow", 0.1, lambda: time.sleep(30.0))
        # capped at remaining + grace, NOT the 500 s floor
        assert time.perf_counter() - t0 < 10.0

    def test_contamination_flagging(self, Harness):
        """A step timed while an abandoned step's thread is still alive is
        recorded in `contaminated` (its numbers may be inflated by the
        zombie's competing device bursts, ADVICE r4); once the zombie
        finishes, later steps are clean again."""
        H = Harness(budget_s=60.0, min_deadline_s=0.5)
        H._probe_relay = lambda t: True

        assert not H.step("zombie", 0.1, lambda: time.sleep(2.5))
        assert H.step("during", 0.1, lambda: None)
        assert H.contaminated == ["during"]
        time.sleep(2.5)  # let the zombie finish
        assert H.step("after", 0.1, lambda: None)
        assert H.contaminated == ["during"]


class TestOuterCapturePolicy:
    """The outer wrapper's scoring/stop rules (VERDICT r4 items 2+8)."""

    @pytest.fixture()
    def bench(self, Harness):
        import bench

        return bench

    def test_degraded_steps_lower_the_score(self, bench):
        clean = {"value": 40.0, "errors": {}, "skipped": []}
        errored = {"value": 40.0, "errors": {"viewer_served": "503"},
                   "skipped": [], "extra": 1, "more": 2}
        # a clean capture beats one with MORE fields but a failed step
        assert bench._capture_score(clean) > bench._capture_score(errored)
        assert bench._capture_score(errored) > bench._capture_score(None)
        assert bench._capture_score({"errors": {}, "skipped": []}) < \
            bench._capture_score(clean)

    def test_healthy_requires_every_step_landed(self, bench):
        assert bench._capture_healthy(
            {"value": 40.0, "errors": {}, "skipped": []})
        # BENCH_r04's shape: headline present but a targeted metric errored
        # — must NOT stop the retry loop
        assert not bench._capture_healthy(
            {"value": 40.0, "errors": {"viewer_served": "HTTP 503"},
             "skipped": []})
        assert not bench._capture_healthy(
            {"value": 40.0, "errors": {}, "skipped": ["fit_quality"]})
        assert not bench._capture_healthy(
            {"value": 40.0, "errors": {}, "skipped": [],
             "hung_step": "turbo"})
        # foul-weather capture: a stalled round inflated the measured
        # barrier — stage splits untrustworthy, retry for a calm window
        assert not bench._capture_healthy(
            {"value": 40.0, "errors": {}, "skipped": [],
             "relay_barrier_ms": 137.96})
        assert not bench._capture_healthy(None)

    def test_score_prefers_calm_weather(self, bench):
        calm = {"value": 50.0, "errors": {}, "skipped": [],
                "relay_barrier_ms": 28.0}
        stormy = {"value": 50.0, "errors": {}, "skipped": [],
                  "relay_barrier_ms": 137.9, "extra": 1}
        assert bench._capture_score(calm) > bench._capture_score(stormy)
