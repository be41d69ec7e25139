"""One-shot hardware validation battery: every claim of record, one command,
one git-SHA-stamped JSON.

Runs, as sequential subprocesses against the real TPU (one tunnel job at a
time — each step exits before the next claims the chip):

  oracle_lanes   oracle_match.py tpu for all 5 suite cases + PointMass, then
                 the 5-case `summary` (the north-star 640-problem score)
  oracle_dense   the same through the dense+trisym serving routing
                 (OM_PATH=dense — select, backward AND forward patched)
  oracle_latency the same through the batch-of-1 trisym latency routing's
                 kernel config (OM_PATH=lanes_trisym, 128-lane tile)
  kernel_probes  select_dense_probe / bw_dense_probe / fwd_dense_probe
                 (dense-vs-lanes bitwise + trisym agreement + timings) and
                 trisym_e2e_probe (end-to-end T*/J agreement at B=1024)
  latency        latency_probe.py (batch-of-1 ms/solve, seq + assoc modes)
  bench          bench.py headline (B=1024 dp-sharded) + the BASELINE.json
                 literal metric config (BENCH_N=100)
  sustained      bench_sustained.py: >= 60 s continuous stream at B=1024
                 (p50/p99 batch time, drift check) + a B=8192 point
  cold_compile   bench.py first-call time against an EMPTY compile cache
                 (regression guard for the deliberate round-4 trade)

Writes results/hw_validate.json stamped with the HEAD SHA; commit that file
after any change to the serving kernels (CLAUDE.md invariant 5 — this
script IS the "re-run after touching them" command).

Usage:
    python scripts/hw_validate.py            # full battery (~30-60 min)
    python scripts/hw_validate.py bench latency   # subset
Env: HV_OUT (output path), HV_TIMEOUT (per-step seconds, default 1500).
"""

import json
import os
import re
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("HV_OUT", os.path.join(REPO, "results", "hw_validate.json"))
STEP_TIMEOUT = int(os.environ.get("HV_TIMEOUT", "1500"))
CACHE_DIR = os.environ.get("JAX_CACHE_DIR", "/tmp/timeopt_jax_cache")

SUITE_CASES = [
    "DoubleIntegrator",
    "Cartpole_SwingUp",
    "Ballbot_Balance",
    "Segway_Balance",
    "Quadrotor",
]


def _env(extra=None):
    env = dict(os.environ)
    # the axon site dir must stay on PYTHONPATH (TPU tunnel client);
    # prepend the repo so subprocesses resolve timeopt_tpu from HEAD
    parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(":") if p]
    env["PYTHONPATH"] = ":".join(dict.fromkeys(parts))
    env.setdefault("JAX_CACHE_DIR", CACHE_DIR)
    if extra:
        env.update({k: str(v) for k, v in extra.items()})
    return env


def run_cmd(args, extra_env=None, timeout=None):
    """Run one subprocess to completion (never killed mid-TPU-claim except by
    the hard timeout); returns (rc, combined_output, seconds)."""
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            args,
            cwd=REPO,
            env=_env(extra_env),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            timeout=timeout or STEP_TIMEOUT,
        )
        rc, out = p.returncode, p.stdout
    except subprocess.TimeoutExpired as e:
        rc, out = -1, (e.stdout or "") + "\n<hw_validate: step timeout>"
    dt = time.perf_counter() - t0
    return rc, out or "", dt


def _tail(out, n=12):
    return "\n".join(out.strip().splitlines()[-n:])


def _parse_summary(out):
    """Parse oracle_match.py summary: per-case + AGGREGATE exact / tied."""
    cases = {}
    for m in re.finditer(
        r"^(\S+)\s+(\d+)/(\d+) [\d.]+\s+(\d+)/(\d+) [\d.]+", out, re.M
    ):
        cases[m.group(1)] = {
            "exact": int(m.group(2)),
            "tied": int(m.group(4)),
            "n": int(m.group(3)),
        }
    agg = cases.pop("AGGREGATE", None)
    return {"cases": cases, "aggregate": agg}


def step_oracle(path):
    """path in ('lanes', 'dense'): re-solve the f32 candidates on the TPU for
    every case, then score against the committed f64 oracle artifacts."""
    res = {"runs": {}}
    for case in SUITE_CASES + ["PointMass_Navigation"]:
        rc, out, dt = run_cmd(
            [sys.executable, "scripts/oracle_match.py", "tpu"],
            {"OM_CASE": case, "OM_PATH": path},
        )
        res["runs"][case] = {"rc": rc, "s": round(dt, 1)}
        if rc != 0:
            res["runs"][case]["tail"] = _tail(out)
    rc, out, dt = run_cmd(
        [sys.executable, "scripts/oracle_match.py", "summary"], {"OM_PATH": path}
    )
    res.update(_parse_summary(out) if rc == 0 else {"summary_tail": _tail(out)})
    # PointMass is outside the 640-problem headline set; score it separately
    rc, out, _ = run_cmd(
        [sys.executable, "scripts/oracle_match.py", "report"],
        {"OM_CASE": "PointMass_Navigation", "OM_PATH": path},
    )
    m = re.search(r"T\* exact match: ([\d.]+)\s+within \+/-1: ([\d.]+)", out)
    m2 = re.search(r"exact-or-tied ([\d.]+)", out)
    if m:
        res["pointmass"] = {
            "exact_rate": float(m.group(1)),
            "within1_rate": float(m.group(2)),
            "exact_or_tied_rate": float(m2.group(1)) if m2 else None,
        }
    return res


def step_kernel_probes():
    res = {}

    rc, out, dt = run_cmd([sys.executable, "scripts/select_dense_probe.py"])
    d = {"rc": rc, "s": round(dt, 1)}
    m = re.search(r"bitwise_equal=(\w+)", out)
    if m:
        d["dense_bitwise_equal"] = m.group(1) == "True"
    m = re.search(
        r"trisym vs dense: max rel ([\d.e+-]+)\s+f32-exact (\d+)/(\d+)\s+"
        r"raw-argmin agree (\d+)/(\d+)",
        out,
    )
    if m:
        d["trisym_max_rel"] = float(m.group(1))
        d["trisym_f32_exact"] = [int(m.group(2)), int(m.group(3))]
        d["trisym_argmin_agree"] = [int(m.group(4)), int(m.group(5))]
    for name in ("lanes", "dense", "trisym"):
        mm = re.search(rf"^{name}\s+per-select\s+([\d.]+) ms", out, re.M)
        if mm:
            d[f"ms_{name}"] = float(mm.group(1))
    if rc != 0:
        d["tail"] = _tail(out)
    res["select"] = d

    rc, out, dt = run_cmd([sys.executable, "scripts/bw_dense_probe.py"])
    d = {"rc": rc, "s": round(dt, 1)}
    m = re.search(r"bitwise_equal=(\w+)", out)
    if m:
        d["dense_bitwise_equal"] = m.group(1) == "True"
    m = re.search(
        r"trisym vs dense: max \|dkap\| ([\d.e+-]+)\s+K rel max ([\d.e+-]+)\s+"
        r"ok agree (\d+)/(\d+)",
        out,
    )
    if m:
        d["trisym_max_dkappa"] = float(m.group(1))
        d["trisym_K_rel_max"] = float(m.group(2))
        d["trisym_ok_agree"] = [int(m.group(3)), int(m.group(4))]
    for name in ("lanes", "dense", "trisym"):
        mm = re.search(rf"^{name}\s+per-backward\s+([\d.]+) ms", out, re.M)
        if mm:
            d[f"ms_{name}"] = float(mm.group(1))
    if rc != 0:
        d["tail"] = _tail(out)
    res["backward"] = d

    rc, out, dt = run_cmd([sys.executable, "scripts/fwd_dense_probe.py"])
    d = {"rc": rc, "s": round(dt, 1)}
    m = re.search(r"bitwise_equal=(\w+)", out)
    if m:
        d["dense_bitwise_equal"] = m.group(1) == "True"
    for name in ("lanes", "dense"):
        mm = re.search(rf"^{name}\s+per-linesearch\s+([\d.]+) ms", out, re.M)
        if mm:
            d[f"ms_{name}"] = float(mm.group(1))
    if rc != 0:
        d["tail"] = _tail(out)
    res["forward"] = d

    rc, out, dt = run_cmd([sys.executable, "scripts/trisym_e2e_probe.py"])
    d = {"rc": rc, "s": round(dt, 1)}
    m = re.search(
        r"B=(\d+)\s+T\* match (\d+)/(\d+)\s+success ([\d.]+) vs ([\d.]+)"
        r"\s+J rel diff med ([\d.e+-]+) max ([\d.e+-]+)",
        out,
    )
    if m:
        d["T_match"] = [int(m.group(2)), int(m.group(3))]
        d["success"] = [float(m.group(4)), float(m.group(5))]
        d["J_rel_med"] = float(m.group(6))
        d["J_rel_max"] = float(m.group(7))
    if rc != 0:
        d["tail"] = _tail(out)
    res["trisym_e2e"] = d
    return res


def step_latency():
    rc, out, dt = run_cmd([sys.executable, "scripts/latency_probe.py"])
    res = {"rc": rc, "s": round(dt, 1)}
    for key, pat in (("seq", r"seq \(batch-of-1 Pallas\)"), ("assoc", r"assoc_df \(time-on-lanes\)")):
        m = re.search(
            pat + r"\s+T\*=\s*(\d+) J\*=\s*([\d.]+)\s+latency/solve=\s*([\d.]+) ms",
            out,
        )
        if m:
            res[key] = {
                "T_star": int(m.group(1)),
                "J_star": float(m.group(2)),
                "ms_per_solve": float(m.group(3)),
            }
    if rc != 0:
        res["tail"] = _tail(out)
    return res


def _parse_bench(out):
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def step_bench():
    res = {}
    rc, out, dt = run_cmd([sys.executable, "bench.py"])
    res["headline"] = _parse_bench(out) or {"rc": rc, "tail": _tail(out)}
    res["headline_s"] = round(dt, 1)
    rc, out, dt = run_cmd([sys.executable, "bench.py"], {"BENCH_N": "100"})
    res["metric_config_n100"] = _parse_bench(out) or {"rc": rc, "tail": _tail(out)}
    res["metric_config_s"] = round(dt, 1)
    return res


def step_sustained():
    """>= 60 s continuous-stream bench + B=8192 linearity point (writes its
    own results/bench_sustained_r05.json; mirrored into this record)."""
    rc, out, dt = run_cmd([sys.executable, "scripts/bench_sustained.py"])
    res = _parse_bench(out) or {}
    res["rc"] = rc
    res["s"] = round(dt, 1)
    if rc != 0:
        res["tail"] = _tail(out)
    return res


def step_cold_compile():
    """First-call (trace+compile+run) time with an EMPTY persistent cache —
    the cost a fresh process/host pays once (round-4 deliberate trade:
    trisym kernels bought −42% runtime for ~+23 s compile)."""
    import tempfile

    with tempfile.TemporaryDirectory(prefix="hv_coldcache_") as tmp:
        rc, out, dt = run_cmd([sys.executable, "bench.py"], {"JAX_CACHE_DIR": tmp})
    res = {"rc": rc, "s": round(dt, 1)}
    m = re.search(r"first call \(compile\+run\): ([\d.]+)s", out)
    if m:
        res["first_call_s"] = float(m.group(1))
    b = _parse_bench(out)
    if b:
        res["solves_per_s"] = b.get("value")
    if rc != 0:
        res["tail"] = _tail(out)
    return res


STEPS = {
    "oracle_lanes": lambda: step_oracle("lanes"),
    "oracle_dense": lambda: step_oracle("dense"),
    "oracle_latency": lambda: step_oracle("lanes_trisym"),
    "kernel_probes": step_kernel_probes,
    "latency": step_latency,
    "bench": step_bench,
    "sustained": step_sustained,
    "cold_compile": step_cold_compile,
}


def main():
    names = sys.argv[1:] or list(STEPS)
    unknown = [n for n in names if n not in STEPS]
    if unknown:
        raise SystemExit(f"unknown steps {unknown}; options: {list(STEPS)}")

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    # dirty = tracked SOURCE modifications only: the battery itself writes
    # (re-)generated files under results/ (this record, the sustained JSON,
    # re-stamped oracle npz), which must not self-flag the run as dirty
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain", "-uno", "--", ".", ":!results"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip()
    )

    record = {
        "sha": sha,
        "dirty": dirty,
        "date": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "steps": {},
    }
    t0 = time.perf_counter()
    for name in names:
        print(f"=== {name} ===", flush=True)
        ts = time.perf_counter()
        try:
            record["steps"][name] = STEPS[name]()
        except Exception as e:  # keep the battery going; record the failure
            record["steps"][name] = {"error": f"{type(e).__name__}: {e}"}
        record["steps"][name]["step_s"] = round(time.perf_counter() - ts, 1)
        print(json.dumps({name: record["steps"][name]}, indent=1), flush=True)
    record["total_s"] = round(time.perf_counter() - t0, 1)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # partial runs (explicit step subset) merge into an existing record at
    # the same SHA so one file stays the single source of truth
    if names != list(STEPS) and os.path.exists(OUT):
        try:
            with open(OUT) as f:
                old = json.load(f)
            if old.get("sha") == sha:
                merged = old.get("steps", {})
                merged.update(record["steps"])
                record["steps"] = merged
        except (json.JSONDecodeError, OSError):
            pass
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}  (sha {sha[:10]}{' DIRTY' if dirty else ''})", flush=True)


if __name__ == "__main__":
    main()
