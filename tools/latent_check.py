"""Latent-family quality anchor: does the VAE actually learn structure?

The reference's ``follow_vae.py`` is the one model family it never made
work (module-level NameError at follow_vae.py:53; a loss that never
evolves psi, follow_vae.py:64-67). Our working rebuild
(models/latent.py) has convergence and parity tests; this tool adds the
"it learned something real" validation (VERDICT r3 item 5):

  1. train the VAE (encoder -> z -> psi_0(z) -> cMPS decoder) on a
     TWO-PITCH damped-sine dataset (each example one of two frequencies,
     random onset delays);
  2. POSTERIOR CHECK: the posterior mean mu separates pitch — held-out
     examples are classified by nearest class-mean in latent space with
     high accuracy (chance = 50%);
  3. CONDITIONAL CHECK: low-temperature samples conditioned on an encoded
     example (sample_latent_conditional: mu -> psi_0 -> SDE) have their
     FFT peak closest to the conditioning example's OWN pitch.

Usage:  python tools/latent_check.py [--steps=3000] [--T=16384]
        [--bond_dim=16] [--batch=16] [--out=PHYSICS_latent.json]

Full-scale run (TPU v5e): see the BASELINE.md "latent quality" row.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from physics_check import learned_line_hz, spectral_peak_hz

PITCHES_HZ = (261.6, 392.0)       # C4 and G4 (the r4 anchor default)


def posterior_accuracy(mu, labels):
    """Held-out nearest-class-mean accuracy of pitch from the posterior
    mean (2-fold: class means from one half classify the other)."""
    mu = np.asarray(mu, np.float64)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    # STRATIFIED 2-fold (alternate within each class): an index-parity
    # split would leave a fold single-class whenever the label order
    # correlates with index parity (empty class-mean -> garbage)
    fold0 = np.zeros(len(labels), bool)
    for c in classes:
        idx_c = np.flatnonzero(labels == c)
        fold0[idx_c[::2]] = True
    folds = (fold0, ~fold0)
    correct = total = 0
    for fit, ev in ((folds[0], folds[1]), (folds[1], folds[0])):
        total += int(ev.sum())
        # only classes with fit members get a mean; eval examples of a
        # class absent from the fit fold count as misclassified (no NaN
        # means — a single-example class must not poison the accuracy)
        have = np.array([c for c in classes
                         if np.any(fit & (labels == c))])
        if not have.size or not ev.any():
            continue
        means = np.stack([mu[fit & (labels == c)].mean(axis=0)
                          for c in have])
        d = ((mu[ev][:, None, :] - means[None]) ** 2).sum(-1)
        correct += int((have[d.argmin(1)] == labels[ev]).sum())
    return correct / total


def knn_accuracy(mu, labels, k: int = 5):
    """Held-out k-NN accuracy (leave-one-out): a nonparametric readout
    of whether mu carries the class. Nearest-class-MEAN assumes each
    class is a single blob — with >=4 classes the posterior can embed
    classes on curves whose means overlap while remaining perfectly
    separable locally (observed r5: class-mean 0.72 where conditional
    generation is 1.0); k-NN probes the local structure."""
    mu = np.asarray(mu, np.float64)
    labels = np.asarray(labels)
    d = ((mu[:, None, :] - mu[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k]
    votes = labels[nn]
    pred = np.array([np.bincount(v).argmax() for v in votes])
    return float((pred == labels).mean())


def fisher_ratio(mu, labels):
    """Margin summary (>> 1 means cleanly separated). Two classes:
    between-class distance^2 over mean within-class variance along the
    class-mean axis. More classes (the >=4-pitch r5 anchor): the MINIMUM
    over class pairs — the weakest separation is what bounds the
    classifier."""
    mu = np.asarray(mu, np.float64)
    labels = np.asarray(labels)
    classes = np.unique(labels)   # only classes actually present
    if classes.size < 2:
        return 0.0

    def _pair(a, b):
        ma, mb = mu[labels == a].mean(0), mu[labels == b].mean(0)
        w = mb - ma
        nw = np.linalg.norm(w)
        if nw == 0:
            return 0.0
        w = w / nw
        pa, pb = mu[labels == a] @ w, mu[labels == b] @ w
        v = 0.5 * (pa.var() + pb.var())
        return float(nw ** 2 / max(v, 1e-12))

    return min(_pair(a, b) for i, a in enumerate(classes)
               for b in classes[i + 1:])


def run(steps=3000, T=2 ** 14, bond_dim=16, batch=16, latent_dim=8,
        seed=0, lr=1e-3, beta=1.0, sample_temp=1e-6, fused=None,
        n_eval=64, tol_hz=40.0, verbose=True, precision="highest",
        pitches_hz=PITCHES_HZ, n_cond=16, free_bits=0.0):
    pitches_hz = tuple(float(p) for p in pitches_hz)
    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.data.synthetic import multi_pitch_batch
    from audio_mps_tpu.models import latent as latent_lib
    from audio_mps_tpu.training import init_params_for, make_train_step

    cfg = CMPSConfig(bond_dim=bond_dim, minibatch_size=batch,
                     learning_rate=lr, scan_chunk=256,
                     latent_dim=latent_dim, latent_beta=beta,
                     latent_free_bits=free_bits,
                     kernel_precision=precision)
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init_params_for("latent", ik, cfg)
    opt, step = make_train_step("latent", cfg, fused=fused)
    opt_state = opt.init(params)

    losses = []
    t0 = time.time()
    for i in range(steps):
        key, dk, ek = jax.random.split(key, 3)
        batch_x, _ = multi_pitch_batch(dk, batch, T, cfg.delta_t,
                                       pitches_hz)
        params, opt_state, metrics = step(params, opt_state, batch_x, ek)
        if i % 200 == 0 or i == steps - 1:
            losses.append((i, float(metrics["model_loss"]),
                           float(metrics["kl"])))
            if verbose:
                print(f"step {i}: elbo={losses[-1][1]:.4f} "
                      f"kl={losses[-1][2]:.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)

    # decoder line diagnostic: the shared Hamiltonian must develop BOTH
    # emission lines for conditional pitch selection to be possible at
    # all (LatentCMPSParams carries the cMPS freqs/R, so the psi-family
    # line detector applies directly)
    lines = {f"learned_line_near_{int(round(p))}_hz":
             learned_line_hz(params, p) for p in pitches_hz}
    if verbose:
        print("learned lines:", lines, flush=True)

    # --- POSTERIOR CHECK on fresh (held-out) examples
    key, vk = jax.random.split(key)
    ev_x, ev_y = multi_pitch_batch(vk, n_eval, T, cfg.delta_t, pitches_hz)
    mu, _ = latent_lib.encode(params, ev_x)
    acc = posterior_accuracy(mu, ev_y)
    acc_knn = knn_accuracy(mu, ev_y)
    fisher = fisher_ratio(mu, ev_y)

    # --- CONDITIONAL CHECK: one low-temperature sample per held-out
    # example; its FFT peak must be CLOSEST to the conditioning pitch
    key, ck, sk = jax.random.split(key, 3)
    cond_x, cond_y = multi_pitch_batch(ck, n_cond, T, cfg.delta_t,
                                       pitches_hz)
    waves = latent_lib.sample_latent_conditional(
        params, cfg, sk, cond_x, min(T, 2 ** 14), temp=sample_temp)
    waves = np.asarray(waves)
    peaks = np.array([spectral_peak_hz(waves[i: i + 1], cfg.delta_t)
                      for i in range(n_cond)])
    pitch_arr = np.asarray(pitches_hz)
    pred = np.abs(peaks[:, None] - pitch_arr[None]).argmin(1)
    cond_acc = float((pred == np.asarray(cond_y)).mean())
    err = np.abs(peaks - pitch_arr[np.asarray(cond_y)])
    med_by_class = {
        f"median_peak_hz_pitch{int(round(p))}": (
            float(np.median(peaks[np.asarray(cond_y) == c]))
            if np.any(np.asarray(cond_y) == c) else None)
        for c, p in enumerate(pitches_hz)}

    result = {
        "config": {"steps": steps, "T": T, "bond_dim": bond_dim,
                   "batch": batch, "latent_dim": latent_dim, "lr": lr,
                   "beta": beta, "free_bits": free_bits, "seed": seed,
                   "precision": precision,
                   "device": str(jax.devices()[0])},
        "pitches_hz": list(pitches_hz),
        **lines,
        "loss_curve": losses,
        "posterior_accuracy": acc,
        "posterior_knn_accuracy": acc_knn,
        "posterior_fisher_ratio": fisher,
        "conditional_accuracy": cond_acc,
        "conditional_median_abs_err_hz": float(np.median(err)),
        **med_by_class,
        "tol_hz": tol_hz,
        # thresholds hold for any class count (chance = 1/K: 0.9/0.75
        # remain far above chance at K >= 2). Either probe passing
        # counts — class-mean assumes single-blob classes; k-NN reads
        # the same information nonparametrically (see knn_accuracy)
        "posterior_pass": max(acc, acc_knn) >= 0.9,
        "conditional_pass": (cond_acc >= 0.75
                             and float(np.median(err)) <= tol_hz),
        "wall_s": round(time.time() - t0, 1),
    }
    result["pass"] = result["posterior_pass"] and result["conditional_pass"]
    return result, params


def main(argv):
    kw = {}
    out = "PHYSICS_latent.json"
    casts = {"steps": int, "T": int, "bond_dim": int, "batch": int,
             "latent_dim": int, "seed": int, "lr": float, "beta": float,
             "sample_temp": float, "n_eval": int, "tol_hz": float,
             "precision": str, "n_cond": int, "free_bits": float,
             "pitches_hz": lambda v: tuple(
                 float(x) for x in v.split(","))}
    for a in argv:
        if not a.startswith("--"):
            continue
        k, v = a[2:].split("=", 1)
        if k == "out":
            out = v
        elif k in casts:
            kw[k] = casts[k](v)
        else:
            raise ValueError(f"unknown flag --{k}")
    result, params = run(**kw)
    print(json.dumps(result, indent=1))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    import pickle
    with open(out + ".params.pkl", "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print(f"wrote {out}: pass={result['pass']}")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
