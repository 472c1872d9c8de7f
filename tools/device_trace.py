"""Capture a REAL device timeline of a train step on the axon TPU.

jax.profiler works on this backend (discovered r4): start_trace/stop_trace
writes a Chrome-trace (trace.json.gz) whose pid '/device:TPU:0' rows carry
per-op TPU durations — custom-calls (the Pallas kernels), XLA fusions,
remats, and while-loop bodies. This settled in minutes what rounds of
indirect kernel-variant probes (probe7/probe8) could only estimate:
e.g. the psi bf16x3 headline step is GAPLESS device-busy 15.2 ms
(fwd custom-call 4.86 + bwd 10.28), and the timing harness's iters=3
rows were inflated ~6 ms/step by the post-barrier first-dispatch cost.

Usage:
  python tools/device_trace.py [--mps_model=psi_mps] [--bond_dim=64]
      [--batch=128] [--T=16385] [--precision=high] [--steps=3]

Prints a per-op duration summary and the top-level timeline with gaps.
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    kw = {"mps_model": "psi_mps", "bond_dim": 64, "batch": 128,
          "T": 16385, "precision": "high", "steps": 3}
    casts = {"bond_dim": int, "batch": int, "T": int, "steps": int,
             "mps_model": str, "precision": str}
    for a in argv:
        if a.startswith("--"):
            k, v = a[2:].split("=", 1)
            kw[k] = casts[k](v)

    import jax
    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.training import init_params_for, make_train_step

    cfg = CMPSConfig(bond_dim=kw["bond_dim"], minibatch_size=kw["batch"],
                     kernel_precision=kw["precision"])
    params = init_params_for(kw["mps_model"], jax.random.PRNGKey(0), cfg)
    opt, step = make_train_step(kw["mps_model"], cfg)
    st = opt.init(params)
    sig = damped_sine_batch(jax.random.PRNGKey(1), kw["batch"], kw["T"],
                            cfg.delta_t)
    params, st, m = step(params, st, sig)
    print(f"warm loss={float(m['model_loss']):.4f}", flush=True)

    tdir = tempfile.mkdtemp(prefix="axon_trace_")
    jax.profiler.start_trace(tdir)
    for _ in range(kw["steps"]):
        params, st, m = step(params, st, sig)
    float(m["model_loss"])                     # readback barrier
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print(f"no trace produced under {tdir}")
        return 1
    d = json.load(gzip.open(traces[-1]))
    dev_pids = {e['pid'] for e in d['traceEvents']
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and 'TPU' in str(e['args'].get('name'))}
    evs = [e for e in d['traceEvents']
           if e.get('pid') in dev_pids and e.get('ph') == 'X']
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        tot[e['name']] += e.get('dur', 0)
        cnt[e['name']] += 1
    print(f"\n{len(evs)} device events over {kw['steps']} steps "
          f"(trace: {traces[-1]})")
    print(f"{'total ms':>10} {'count':>6}  op")
    for n, t in tot.most_common(20):
        print(f"{t/1e3:10.2f} {cnt[n]:6d}  {n[:70]}")
    # gap analysis over the biggest ops (>1 ms), per thread
    big = sorted((e for e in evs if e.get('dur', 0) > 1000),
                 key=lambda e: (e.get('tid'), e['ts']))
    by_tid = collections.defaultdict(list)
    for e in big:
        by_tid[e.get('tid')].append(e)
    for tid, lst in sorted(by_tid.items()):
        gap = sum(max(0, b['ts'] - (a['ts'] + a['dur']))
                  for a, b in zip(lst, lst[1:]))
        span = lst[-1]['ts'] + lst[-1]['dur'] - lst[0]['ts']
        print(f"tid {tid}: {len(lst)} ops >1ms, span {span/1e3:.2f} ms, "
              f"inter-op gaps {gap/1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
