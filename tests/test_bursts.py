import datetime as dt
import math
import random

from kgforge.datapipe.profile import hourly_bursts


def _mk_events(counts):
    """counts: {(type, hour_index): n} -> event rows in January 2024."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    for (t, h), n in counts.items():
        for i in range(n):
            rows.append((base + dt.timedelta(hours=h, seconds=i), t))
    return rows


def _mirror(counts, window=24, min_history=12, z_thresh=2.0):
    by_type = {}
    for (t, h), n in counts.items():
        by_type.setdefault(t, []).append((h, n))
    out = {}
    for t, series in by_type.items():
        series.sort()
        for i, (h, n) in enumerate(series):
            trail = [x for _, x in series[max(0, i - window):i]]
            if len(trail) >= min_history:
                s1, s2, c = sum(trail), sum(x * x for x in trail), len(trail)
                var = (s2 - s1 * s1 / c) / (c - 1)
                if var > 0:
                    z = (n - s1 / c) / math.sqrt(var)
                    out[(t, h)] = (round(z, 6), z >= z_thresh)
                    continue
            out[(t, h)] = (None, False)
    return out


def test_burst_flags_spike_and_matches_mirror(spark):
    rnd = random.Random(3)
    counts = {("click", h): rnd.randint(3, 7) for h in range(48)}
    counts[("click", 40)] = 60  # the spike
    counts.update({("view", h): 5 for h in range(20)})  # zero variance type
    rows = _mk_events(counts)
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {}
    for r in hourly_bursts(df).collect():
        h = (dt.datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S")
             - dt.datetime(2024, 1, 1)).total_seconds() / 3600
        got[(r["type"], int(h))] = (
            None if r["z"] is None else round(r["z"], 6),
            r["burst"],
        )
    want = _mirror(counts)
    assert set(got) == set(want)
    for k in want:
        gz, gb = got[k]
        wz, wb = want[k]
        assert gb == wb, k
        if wz is None:
            assert gz is None, k
        else:
            assert abs(gz - wz) < 2e-6, k
    assert got[("click", 40)][1] is True
    # constant 'view' series: zero variance -> never flagged, z NULL
    assert all(not got[("view", h)][1] for h in range(20))
    assert all(got[("view", h)][0] is None for h in range(12, 20))
