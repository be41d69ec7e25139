"""Unit tests for the hardware-validation battery's output parsers
(scripts/hw_validate.py) — the battery itself needs the TPU, but the
parsing of probe stdout into the stamped JSON record is pure string work
and must not rot (a silent parse miss would drop a number of record)."""

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "hw_validate",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "hw_validate.py"),
)
hv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(hv)


def test_parse_oracle_summary():
    out = """
DoubleIntegrator      128/128 1.000  128/128 1.000   landscape
Segway_Balance         127/128 0.992  128/128 1.000   landscape
AGGREGATE             637/640 0.995  640/640 1.000
"""
    r = hv._parse_summary(out)
    assert r["aggregate"] == {"exact": 637, "tied": 640, "n": 640}
    assert r["cases"]["Segway_Balance"] == {"exact": 127, "tied": 128, "n": 128}
    assert "AGGREGATE" not in r["cases"]


def test_parse_bench_json_line():
    out = (
        "device: tpu x1\nfirst call (compile+run): 55.6s\n"
        + json.dumps({"metric": "m", "value": 2987.36, "unit": "solves/s"})
        + "\n"
    )
    assert hv._parse_bench(out)["value"] == 2987.36
    assert hv._parse_bench("no json here") is None


def test_latency_line_regex():
    import re

    line = ("  seq (batch-of-1 Pallas)      T*=  51 J*=    449.1444 "
            "latency/solve=   46.06 ms  (t_lo=0.117s t_hi=0.485s)")
    m = re.search(
        r"seq \(batch-of-1 Pallas\)\s+T\*=\s*(\d+) J\*=\s*([\d.]+)\s+"
        r"latency/solve=\s*([\d.]+) ms",
        line,
    )
    assert m and int(m.group(1)) == 51 and float(m.group(3)) == 46.06


def test_probe_line_regexes():
    import re

    sel = (
        "B=1024 N=160 t_min=1  bitwise_equal=True\n"
        "trisym vs dense: max rel 8.92e-08  f32-exact 159772/163840"
        "  raw-argmin agree 1024/1024\n"
        "lanes  per-select    40.94 ms  (1 rep   123.4, 8 reps   410.1)\n"
        "trisym per-select    19.45 ms  (1 rep   100.0, 8 reps   240.0)\n"
    )
    assert re.search(r"bitwise_equal=(\w+)", sel).group(1) == "True"
    m = re.search(
        r"trisym vs dense: max rel ([\d.e+-]+)\s+f32-exact (\d+)/(\d+)\s+"
        r"raw-argmin agree (\d+)/(\d+)",
        sel,
    )
    assert m and float(m.group(1)) == 8.92e-08
    m = re.search(r"^trisym\s+per-select\s+([\d.]+) ms", sel, re.M)
    assert m and float(m.group(1)) == 19.45

    e2e = ("B=1024  T* match 1021/1024  success 1.0000 vs 1.0000"
           "  J rel diff med 0.00e+00 max 5.87e-05  T* median 51 range [40, 60]")
    m = re.search(
        r"B=(\d+)\s+T\* match (\d+)/(\d+)\s+success ([\d.]+) vs ([\d.]+)"
        r"\s+J rel diff med ([\d.e+-]+) max ([\d.e+-]+)",
        e2e,
    )
    assert m and int(m.group(2)) == 1021 and float(m.group(7)) == 5.87e-05
