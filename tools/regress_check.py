"""One-command perf + parity regression gate (VERDICT r4 item 2).

Five quality harnesses existed (certificate, conformance sweep, bench,
physics, dryrun) but nothing failed loudly when a change regressed a
measured row — each round re-discovered the numbers by hand. This tool:

  1. re-times the fused benchmark rows SERIALIZED, in REPEAT PAIRS
     (CLAUDE.md r4 measurement lesson: three contaminated numbers came
     from concurrent chip jobs; a pair that disagrees >8% re-runs and
     takes the median-of-3 before any verdict);
  2. compares each row to the recorded baseline and FAILS (exit 1) on a
     >10% regression;
  3. recomputes the fused loss values at a short T from fixed seeds and
     FAILS on parity drift (fp32 rtol 1e-5; bf16x3 rtol 2e-3);
  4. with --full, also runs the 44-case conformance sweep and the
     consistency certificate (CPU subprocesses) and folds their verdicts
     in.

Usage (repo root, real TPU for the timing rows):
  python tools/regress_check.py --record     # write REGRESS_BASELINE.json
  python tools/regress_check.py              # gate vs the baseline
  python tools/regress_check.py --full       # + sweep + certificate
  python tools/regress_check.py --baseline BENCH_LOCAL.json
  python tools/regress_check.py --quick      # tiny shapes (gate smoke)

Always writes REGRESS_LOCAL.json with the verdict and every number, and
prints a compact JSON verdict line LAST (tail-capture-proof, like
bench.py).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REGRESSION_TOLERANCE = 0.10   # >10% slower than baseline fails
PAIR_TOLERANCE = 0.08         # pair disagreement that triggers a re-run
LOSS_RTOL = {"highest": 1e-5, "high": 2e-3}


def _rows(quick: bool):
    """(name, callable) timing rows — the fused rows BASELINE.md quotes.
    Defined lazily so --record/--check on a dead chip fails fast in the
    first row instead of at import."""
    import bench
    D = 16 if quick else 64
    Bw = 32 if quick else 128
    B = 8
    T = 4096 if quick else 16384
    iters = 3 if quick else 10
    return [
        ("psi_headline_fp32_ms",
         lambda: bench.bench_fused_train("psi_mps", D, Bw, T, iters)),
        ("psi_headline_bf16x3_ms",
         lambda: bench.bench_fused_train("psi_mps", D, Bw, T, iters,
                                         precision="high")),
        ("rho_fused_fp32_ms",
         lambda: bench.bench_fused_train("rho_mps", D, B, T, iters)),
        ("rho_fused_bf16x3_ms",
         lambda: bench.bench_fused_train("rho_mps", D, B, T, iters,
                                         precision="high")),
        ("rank_partials_ms",
         lambda: bench.bench_rank_partials_train(D, B, T, iters)[0]),
    ]


# row name here -> detail key in a bench artifact (BENCH_LOCAL.json or a
# driver BENCH_r0N.json), so the gate can bootstrap its baseline from one
BENCH_DETAIL_KEYS = {
    "psi_headline_fp32_ms": "train_step_ms_headline",
    "psi_headline_bf16x3_ms": "train_step_ms_headline_bf16x3",
    "rho_fused_fp32_ms": "train_step_ms_rho_fused",
    "rho_fused_bf16x3_ms": "train_step_ms_rho_fused_bf16x3",
    "rank_partials_ms": "train_step_ms_rho_rank_partials",
}


def measure_row(fn):
    """Timed pair; median-of-3 if the pair disagrees (contamination
    guard). Returns (value, all_measurements)."""
    a = fn()
    b = fn()
    vals = [a, b]
    if abs(a - b) / min(a, b) > PAIR_TOLERANCE:
        vals.append(fn())
        vals.sort()
        return vals[1], vals
    return min(a, b), vals


def fused_losses(quick: bool):
    """Fused loss values from fixed seeds at a short T — parity-drift
    canaries for the exact kernels the timing rows run."""
    import jax

    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.models.params import init_psi, init_rho
    from audio_mps_tpu.training import nll_fn_for
    T = 513 if quick else 1025
    out = {}
    for family, D, B in (("psi_mps", 16 if quick else 64, 16),
                         ("rho_mps", 16 if quick else 64, 4)):
        for prec in ("highest", "high"):
            cfg = CMPSConfig(bond_dim=D, minibatch_size=B,
                             scan_chunk=256, kernel_precision=prec)
            init = init_rho if family == "rho_mps" else init_psi
            params = init(jax.random.PRNGKey(0), cfg)
            batch = damped_sine_batch(jax.random.PRNGKey(1), B, T,
                                      cfg.delta_t)
            nll = nll_fn_for(family)
            out[f"{family}_{prec}"] = float(nll(params, cfg, batch))
    return out


def load_baseline(path):
    with open(path) as f:
        data = json.load(f)
    if "rows" in data:           # native REGRESS_BASELINE.json
        return data
    detail = data.get("detail")
    if detail is None and isinstance(data.get("parsed"), dict):
        detail = data["parsed"].get("detail")
    if detail is None and isinstance(data.get("tail"), str):
        # driver artifact whose JSON got tail-truncated: scavenge the keys
        detail = {}
        for k in BENCH_DETAIL_KEYS.values():
            m = re.search(r'"%s":\s*([0-9.]+)' % re.escape(k),
                          data["tail"])
            if m:
                detail[k] = float(m.group(1))
    if not detail:
        raise SystemExit(f"cannot extract baseline rows from {path}")
    rows = {name: detail[key] for name, key in BENCH_DETAIL_KEYS.items()
            if key in detail}
    return {"rows": rows, "losses": {}, "meta": {"bootstrapped_from": path}}


def run_sweeps():
    """--full: conformance sweep + consistency certificate as CPU
    subprocesses (their env setup is self-contained / in conftest)."""
    results = {}
    sweep = subprocess.run([sys.executable, "tools/conformance_sweep.py"],
                           cwd=REPO, capture_output=True, text=True)
    m = re.search(r"FAILURES: (\d+)", sweep.stdout)
    results["conformance_failures"] = int(m.group(1)) if m else -1
    results["conformance_ok"] = (sweep.returncode == 0
                                 and results["conformance_failures"] == 0)
    cert = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_consistency.py", "-q"],
        cwd=REPO, capture_output=True, text=True)
    results["certificate_ok"] = cert.returncode == 0
    results["certificate_tail"] = cert.stdout.strip().splitlines()[-1][:200] \
        if cert.stdout.strip() else ""
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="write REGRESS_BASELINE.json instead of gating")
    ap.add_argument("--baseline", default=None,
                    help="baseline file (default REGRESS_BASELINE.json, "
                         "falling back to BENCH_LOCAL.json)")
    ap.add_argument("--full", action="store_true",
                    help="also run conformance sweep + certificate")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (gate smoke, not a real baseline)")
    ap.add_argument("--timing-only", action="store_true",
                    help="skip the loss-drift canaries")
    args = ap.parse_args()

    t0 = time.time()
    result = {"quick": args.quick, "rows": {}, "pairs": {}, "losses": {},
              "failures": []}
    result["shapes"] = "D16_B32_T4096" if args.quick else "D64_B128_T16384"

    for name, fn in _rows(args.quick):
        val, vals = measure_row(fn)
        result["rows"][name] = round(val * 1e3, 2)
        result["pairs"][name] = [round(v * 1e3, 2) for v in vals]
        print(f"{name}: {result['rows'][name]} ms "
              f"(pair {result['pairs'][name]})", flush=True)

    if not args.timing_only:
        result["losses"] = {k: v for k, v in fused_losses(args.quick).items()}
        print("losses:", json.dumps(result["losses"]), flush=True)

    if args.record:
        out = os.path.join(REPO, "REGRESS_BASELINE.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({"regress_check": "recorded", "out": out,
                          "rows": result["rows"]}))
        return

    base_path = args.baseline
    if base_path is None:
        for cand in ("REGRESS_BASELINE.json", "BENCH_LOCAL.json"):
            if os.path.exists(os.path.join(REPO, cand)):
                base_path = os.path.join(REPO, cand)
                break
    if base_path is None:
        raise SystemExit("no baseline found — run with --record first "
                         "(or pass --baseline)")
    baseline = load_baseline(base_path)
    result["baseline"] = base_path
    # rows are only comparable at the same shapes: a --quick baseline
    # against a full run (or vice versa) would flag spurious 8x
    # "regressions" in one direction and mask real ones in the other
    base_shapes = baseline.get("shapes",
                               "D16_B32_T4096" if baseline.get("quick")
                               else "D64_B128_T16384")
    if base_shapes != result["shapes"]:
        raise SystemExit(
            f"baseline {base_path} was recorded at {base_shapes}, this "
            f"run is {result['shapes']} — re-record with --record"
            f"{' --quick' if args.quick else ''}")

    for name, val in result["rows"].items():
        ref = baseline["rows"].get(name)
        if ref is None:
            continue
        ratio = val / ref
        if ratio > 1.0 + REGRESSION_TOLERANCE:
            result["failures"].append(
                f"{name}: {val} ms vs baseline {ref} ms "
                f"({100 * (ratio - 1):.1f}% slower)")

    for key, val in result["losses"].items():
        ref = baseline.get("losses", {}).get(key)
        if ref is None:
            continue
        rtol = LOSS_RTOL["high" if key.endswith("_high") else "highest"]
        if abs(val - ref) > rtol * max(1.0, abs(ref)):
            result["failures"].append(
                f"loss drift {key}: {val!r} vs baseline {ref!r} "
                f"(rtol {rtol})")

    if args.full:
        sweeps = run_sweeps()
        result.update(sweeps)
        if not sweeps["conformance_ok"]:
            result["failures"].append(
                f"conformance sweep: {sweeps['conformance_failures']} "
                "failures")
        if not sweeps["certificate_ok"]:
            result["failures"].append(
                f"certificate: {sweeps['certificate_tail']}")

    result["ok"] = not result["failures"]
    result["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(REPO, "REGRESS_LOCAL.json"), "w") as f:
        json.dump(result, f, indent=1)
    summary = {"regress_check": "ok" if result["ok"] else "FAIL",
               "failures": result["failures"],
               "rows": result["rows"],
               "baseline": base_path,
               "wall_s": result["wall_s"]}
    if args.full:
        summary["conformance_ok"] = result.get("conformance_ok")
        summary["certificate_ok"] = result.get("certificate_ok")
    print(json.dumps(summary))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
