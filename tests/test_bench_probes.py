"""Host-noise witness probes in bench.py (r14 optimization round).

Pure-Python: no Spark session.  Pins the probe plumbing and the
contamination arm added after the r14 variance record (a 23.4 s suite —
2.7x the sealed floor, identical code — printed ``contaminated: false``
because load accounting cannot see host-level oversubscription).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_probe, _mem_probe, _par_probe, _probe_stats  # noqa: E402


def test_probes_return_positive_seconds():
    c = _cpu_probe()
    m = _mem_probe()
    assert 0.0 < c < 30.0
    assert 0.0 < m < 30.0


def test_par_probe_runs_in_subprocess():
    p = _par_probe()
    # 0.0 is the documented "no data" fallback; a real reading is
    # positive and bounded.
    assert 0.0 <= p < 60.0
    assert p != 0.0, "parallel probe subprocess failed on this box"


def test_probe_stats_shape_and_order():
    stats = _probe_stats([0.3, 0.1, 0.2, 0.15, 0.25])
    assert set(stats) == {"min", "med", "max"}
    assert stats["min"] == 0.1
    assert stats["med"] == 0.2
    assert stats["max"] == 0.3
    assert stats["min"] <= stats["med"] <= stats["max"]


def test_host_noise_arm_needs_sustained_variance():
    """The contaminated arm fires on sorted(probes)[-3] >= 2*min: a
    single blip (GC pause, page fault) must NOT flag a clean run; three
    elevated probes of 18 must."""
    def arm(probes):
        return sorted(probes)[-3] >= 2.0 * min(probes)

    quiet = [0.08] * 18
    assert not arm(quiet)
    one_blip = [0.08] * 17 + [0.30]
    assert not arm(one_blip)
    two_blips = [0.08] * 16 + [0.30, 0.25]
    assert not arm(two_blips)
    slow_window = [0.08] * 15 + [0.23, 0.21, 0.19]
    assert arm(slow_window)
    uniformly_slow_half = [0.08] * 9 + [0.20] * 9
    assert arm(uniformly_slow_half)


def test_parallel_throughput_arm():
    """The par-probe arm fires on an >=1.8x before/after shift and
    stays silent on steady-box noise (~1.1-1.3x) or a failed probe."""
    def arm(before, after):
        return (min(before, after) > 0.0
                and max(before, after) >= 1.8 * min(before, after))

    assert not arm(0.26, 0.29)          # steady-box noise
    assert not arm(0.26, 0.33)          # 1.27x, still noise
    assert arm(0.478, 0.251)            # the observed contended start
    assert arm(0.25, 0.50)              # contended end, same verdict
    assert not arm(0.0, 0.26)           # failed probe: no verdict
    assert not arm(0.26, 0.0)
