#!/usr/bin/env python3
"""Independent Holt-Winters oracle for the hw_* correctness rows.

Re-implements the reference's multiplicative triple-exponential smoothing
and Nelder-Mead SSE auto-fit (`series/holtwinters.go:28-162`,
`series/neldermead.go:31-242` — themselves the public NIST/nmoptim
formulas) in pure Python, reading the dense series grid through DuckDB
(the same `denseSql` text the relational oracles use). This is a second,
JVM-free implementation: Spark result == this tool's parquet means two
independent engines agree bit-for-bit.

Usage: hw_oracle.py <sfDir> <outDir>
Emits <outDir>/<query>.parquet for hw_forecast, hw_confidence,
hw_aberration, hw_autofit with columns (name, t, value) in the gate's
row order (name, t, value ascending).
"""
import math
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

STEP = 3600
SLEN = 24      # 1d season at the 1h store step
NPRED = 24     # forecast one season past the data
BIAS = 0.500137


def r6(x):
    # graft.ts.Round6: floor(x*1e6 + bias)/1e6, fixed IEEE op sequence
    return math.floor(x * 1e6 + BIAS) / 1e6


DENSE_SQL = f"""
WITH bounds AS (
  SELECT CAST(floor(epoch(min(ts)) / {STEP}) AS BIGINT) * {STEP} AS lo,
         CAST(floor(epoch(max(ts)) / {STEP}) AS BIGINT) * {STEP} AS hi
  FROM events
), grid AS (
  SELECT unnest(generate_series(lo, hi, {STEP})) AS t FROM bounds
), names AS (
  SELECT DISTINCT event_type AS name FROM events
), raw AS (
  SELECT event_type AS name,
         CAST(floor(epoch(ts) / {STEP}) AS BIGINT) * {STEP} AS t,
         floor((avg(value)) * 1000000.0 + {BIAS}) / 1000000.0 AS value
  FROM events GROUP BY 1, 2
)
SELECT n.name, g.t, r.value
FROM grid g CROSS JOIN names n
LEFT JOIN raw r ON r.name = n.name AND r.t = g.t
ORDER BY n.name, g.t
"""


def load_series(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    series = {}
    for name, t, value in con.execute(DENSE_SQL).fetchall():
        series.setdefault(name, []).append((t, value))
    return series


def nanless(pts):
    """Leading unknowns skipped, interior unknowns recycle the last
    known value (`dsl/funcs.go:2409-2434`)."""
    from_idx = next((i for i, p in enumerate(pts) if p[1] is not None), -1)
    if from_idx < 0:
        return None, None
    known = pts[from_idx:]
    start = known[0][0]
    data = []
    last = 0.0
    for _, v in known:
        if v is not None:
            last = v
        data.append(last)
    return start, data


def initial_trend(data, slen):
    tot = 0.0
    for i in range(slen):
        tot += (data[i + slen] - data[i]) / slen
    return tot / slen


def initial_seasonal(data, slen):
    n_seasons = len(data) // slen
    season_avg = []
    for j in range(n_seasons):
        s = 0.0
        for i in range(slen):
            s += data[j * slen + i]
        season_avg.append(s / slen)
    seasonal = []
    for i in range(slen):
        s = 0.0
        for j in range(n_seasons):
            s += data[j * slen + i] / season_avg[j]
        seasonal.append(s / n_seasons)
    return seasonal


HUGE_SSE = float(2 ** 63 - 1)  # float64(max int64), the repellent SSE


def smooth(data, slen, trend0, seasonal, n_predictions, a, b, g):
    """Triple exponential smoothing. MUTATES `seasonal` (callers that
    re-evaluate pass a copy, as the reference does)."""
    if a <= 0 or a >= 1 or b <= 0 or b >= 1 or g <= 0 or g >= 1:
        return [], [], HUGE_SSE
    n = len(data) + n_predictions
    result = [0.0] * n
    dev = [0.0] * n
    seasonal_dev = [0.0] * slen
    level = 0.0
    trend = trend0
    sse = 0.0
    for i in range(n):
        if i == 0:
            level = data[0]
            result[0] = data[0]
            continue  # dev[0] stays 0
        if i >= len(data):  # forecasting
            m = i - len(data) + 1
            result[i] = (level + m * trend) * seasonal[i % slen]
        else:
            v = data[i]
            last_level = level
            level = a * v / seasonal[i % slen] + (1 - a) * (level + trend)
            trend = b * (level - last_level) + (1 - b) * trend
            seasonal[i % slen] = g * v / level + (1 - g) * seasonal[i % slen]
            result[i] = (level + trend) * seasonal[i % slen]
            if i > 2:
                factor = result[i] / v
                if factor > 1:
                    factor = 1 / factor
                seasonal_dev[i % slen] = (
                    g * (1 - factor) + (1 - g) * seasonal_dev[i % slen])
                diff = result[i] - v
                sse += diff * diff
        dev[i] = seasonal_dev[i % slen]
    return result, dev, sse


def nelder_mead(f, start):
    """Downhill simplex with the reference's constants and exact
    reflection/expansion/contraction/shrink sequencing."""
    k_max = 1000
    eps = 0.000001
    alpha, beta, gamma = 1.0, 0.5, 2.0

    n = len(start)
    assert n == len(start[0]) + 1
    sx = [list(p) for p in start]
    fv = [f(x) for x in sx]

    def sub(x, y):
        return [x[i] - y[i] for i in range(len(x))]

    def add(x, y):
        return [x[i] + y[i] for i in range(len(x))]

    def scale(p, s):
        return [v * s for v in p]

    def centroid(omit):
        out = []
        for i in range(len(sx[0])):
            c = 0.0
            for j in range(n):
                if j != omit:
                    c += sx[j][i]
            out.append(c / (n - 1))
        return out

    k = 0
    while k < k_max:
        vg = 0
        for i in range(len(fv)):
            if fv[i] > fv[vg]:
                vg = i
        vs = 0
        for i in range(len(fv)):
            if fv[i] < fv[vs]:
                vs = i
        vh = vs
        for i in range(len(fv)):
            if fv[i] > fv[vh] and fv[i] < fv[vg]:
                vh = i

        vm = centroid(vg)
        vr = add(vm, scale(sub(vm, sx[vg]), alpha))
        fr = f(vr)

        if fr < fv[vh] and fr >= fv[vs]:
            fv[vg] = fr
            sx[vg] = vr

        if fr < fv[vs]:  # expansion
            ve = add(vm, scale(sub(vr, vm), gamma))
            fe = f(ve)
            if fe < fr:
                sx[vg] = ve
                fv[vg] = fe
            else:
                sx[vg] = vr
                fv[vg] = fr

        if fr >= fv[vh]:  # contraction
            if fr < fv[vg] and fr >= fv[vh]:
                vc = add(vm, scale(sub(vr, vm), beta))
            else:
                vc = sub(vm, scale(sub(vm, sx[vg]), beta))
            fc = f(vc)
            if fc < fv[vg]:
                sx[vg] = vc
                fv[vg] = fc
            else:  # shrink toward best
                for i in range(n):
                    if i != vs:
                        sx[i] = add(sx[vs], scale(sub(sx[i], sx[vs]), beta))
                fv[vg] = f(sx[vg])
                fv[vh] = f(sx[vh])

        favg = sum(fv) / len(fv)
        s = 0.0
        for v in fv:
            s += (v - favg) * (v - favg)
        s = math.sqrt(s * (1.0 / (len(fv) + 1.0)))
        if s < eps:
            break
        k += 1

    vs = 0
    for i in range(len(fv)):
        if fv[i] < fv[vs]:
            vs = i
    return sx[vs]


def minimize_sse(data, slen, trend, seasonal, n_pred):
    def f(x):
        _, _, sse = smooth(data, slen, trend, list(seasonal), n_pred,
                           x[0], x[1], x[2])
        return sse

    start = [[0.1, 0.01, 0.9], [0.9, 0.1, 0.1],
             [0.5, 0.2, 0.5], [0.1, 0.9, 0.1]]
    r = nelder_mead(f, start)
    s, d, _ = smooth(data, slen, trend, list(seasonal), n_pred,
                     r[0], r[1], r[2])
    return s, d


def hw_rows(series, names, abg, dev_scale, show):
    rows = []
    for name in names:
        start, data = nanless(series[name])
        if start is None:
            continue
        trend = initial_trend(data, SLEN)
        seasonal = initial_seasonal(data, SLEN)
        if abg is not None:
            a, b, g = abg
            sm, dv, _ = smooth(data, SLEN, trend, list(seasonal), NPRED,
                               a, b, g)
        else:
            sm, dv = minimize_sse(data, SLEN, trend, seasonal, NPRED)
        for i in range(len(sm)):
            t = start + i * STEP
            upper = sm[i] + sm[i] * dv[i] * dev_scale
            lower = sm[i] - sm[i] * dv[i] * dev_scale
            if "smooth" in show:
                rows.append((f"holtWintersForecast({name})", t, sm[i]))
            if "conf" in show:
                rows.append((f"holtWintersConfidenceUpper({name})", t, upper))
                rows.append((f"holtWintersConfidenceLower({name})", t, lower))
            if "aberr" in show:
                if sm[i] < lower:
                    ab = sm[i] - lower
                elif sm[i] > upper:
                    ab = sm[i] - upper
                else:
                    ab = 0.0
                rows.append((f"holtWintersAberration({name})", t, ab))
    rows = [(n, t, r6(v)) for n, t, v in rows]
    rows.sort()
    return rows


def write(rows, path):
    tbl = pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "t": pa.array([r[1] for r in rows], pa.int64()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, path)
    print(f"wrote {path} ({len(rows)} rows)")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import os
    os.makedirs(out_dir, exist_ok=True)
    series = load_series(sf_dir)
    all_names = sorted(series)
    write(hw_rows(series, ["click"], (0.5, 0.4, 0.6), 10.0, "smooth"),
          f"{out_dir}/hw_forecast.parquet")
    write(hw_rows(series, ["click"], (0.5, 0.4, 0.6), 10.0, "conf"),
          f"{out_dir}/hw_confidence.parquet")
    write(hw_rows(series, ["view"], (0.5, 0.4, 0.6), 3.0, "aberr"),
          f"{out_dir}/hw_aberration.parquet")
    write(hw_rows(series, all_names, None, 10.0, "smooth"),
          f"{out_dir}/hw_autofit.parquet")


if __name__ == "__main__":
    main()
