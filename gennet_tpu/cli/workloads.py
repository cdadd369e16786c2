"""End-to-end workloads — the reference's main() loops, rebuilt device-first.

Two workloads:
- :func:`run_burst_smoke` — the sine-Gaussian burst mahoGANy
  (ref: tests/burstMahoGANy.py:569-901): analytic bank, exact grid
  posterior, CNN PE, 3-loss GAN, posterior-vs-grid validation. No waveform
  physics needed; CPU-capable; the smoke gate.
- :func:`run_bbh` — the flagship GW150914 pipeline
  (ref: BBH_version/bbhMahoGANy.py:959-1384): whitened IMR template bank,
  measured event (synthetic twin or lalinference products when mounted),
  CNN PE then GAN, posterior draws through the CNN, β-overlap tracking,
  orbax checkpoints.

Both run their hot loops as fused jitted steps with on-device RNG; the host
only touches data at eval cadence.
"""

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gennet_tpu.data import template_bank as tb
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import overlap as ov
from gennet_tpu.models import (
    BBHGenerator,
    BurstDiscriminator,
    BurstGenerator,
    BurstPE,
    DualBranchPE,
    PairDiscriminator,
)
from gennet_tpu.physics import priors
from gennet_tpu.physics import psd as psd_mod
from gennet_tpu.physics.burst import make_burst_bank, sine_gaussian
from gennet_tpu.train import (
    CNNConfig,
    GANConfig,
    init_cnn,
    init_gan,
    make_cnn_step,
    make_gan_step,
)
from gennet_tpu.train.cnn import predict as cnn_predict
from gennet_tpu.train.gan import sample_generator
from gennet_tpu.train.checkpoints import CheckpointManager, save_posterior_snapshot
from gennet_tpu.train.metrics import MetricLogger, fetch_metrics


@dataclass
class BurstSmokeConfig:
    """Smoke-workload config (ref defaults: burstMahoGANy.py:31-48)."""

    n_pix: int = 512
    n_signals: int = 50_000
    n_sig: float = 0.25
    batch_size: int = 64
    gan_iters: int = 50_000
    pe_iters: int = 60_000            # the reference's 1000 (ref: :39) leaves
                                      # the CNN as the accuracy bottleneck:
                                      # measured sanity bound 0.19 at 1k vs
                                      # 0.98 at 20k; 60k converges the
                                      # noise-augmented variant (~2 min TPU)
    lr: float = 2e-4
    cadence: int = 100
    pe_grain: int = 95
    n_posterior: int = 4000
    label_smoothing: bool = True      # one-sided smoothing kept from r1
    instance_noise: float = 0.0       # r2 measured: instance noise at n_sig
                                      # caps waveform fidelity at corr ~0.6
                                      # (r1 default was n_sig via −1; the
                                      # high-residual-weight recipe below
                                      # stabilizes without it; set −1 to get
                                      # the r1 behavior back)
    d_lr_scale: float = 0.5           # slow D to avoid late-run divergence
    d_acc_gate: float = 0.0           # adaptive D/G balance: skip the D update
                                      # while its batch accuracy ≥ gate (0 =
                                      # off = reference's fixed schedule)
    diversity_weight: float = 0.0     # mode-seeking regularizer on G draws
    r1_gamma: float = 0.0             # R1 gradient penalty on D (γ/2·E‖∇ₓD‖²)
    res_loss_weight: float = 10.0     # weight of the residual-moment route
                                      # (r2 measured: the single biggest
                                      # localization lever — D cannot
                                      # penalize wrong (t0,τ) since the bank
                                      # spans the whole prior)
    posterior_temp: float = 1.0       # latent temperature for posterior draws
    per_sample_max: bool = False      # CNN max-normalization per sample
                                      # instead of per batch (ablation of the
                                      # reference's global-max convention)
    snapshot_every: int = 1           # pool snapshots every k-th cadence
                                      # point (longer ensemble horizon)
    n_snapshots: int = 1              # posterior draws pooled over the k most
                                      # recent snapshot states (snapshot
                                      # ensemble over the adversarial
                                      # oscillation; 1 = reference behavior)
    g_ema_decay: float = 0.0          # EMA of G params for posterior draws —
                                      # measured HARMFUL here (0.03 vs 0.23
                                      # overlap at 20k iters: weight-space
                                      # averaging across oscillation states
                                      # blurs waveforms); knob kept for long
                                      # runs, default off
    posterior_dropout: bool = False   # MC-dropout sampling hurts the burst
                                      # scheme (measured: its GaussianDropout
                                      # 0.3 makes draws too noisy, grid
                                      # overlap 0.15 vs 0.33); BBH keeps it on
    posterior_drate: float = -1.0     # if ≥0: sample through a generator
                                      # clone with THIS GaussianDropout rate
                                      # (weaker than the 0.3 training rate) —
                                      # a variational sampler that restores
                                      # dispersion a collapsed G lost, without
                                      # the full training-noise level
    posterior_noise: float = 0.0      # if >0: add fresh N(0, this·n_sig)
                                      # measurement noise to each G draw
                                      # before the CNN — dispersion then
                                      # comes from the likelihood's own noise
                                      # scale (a parametric bootstrap through
                                      # the point estimator) instead of a
                                      # tuned dropout rate. Pair with
                                      # pe_noise_frac > 0 so the CNN is
                                      # noise-calibrated (the flagship CNN's
                                      # augmentation idiom, ref
                                      # bbhMahoGANy.py:1160-1161)
    pe_noise_frac: float = 0.5        # fraction of each CNN batch that gets
                                      # N(0, U(0,5)·n_sig) noise added (ref
                                      # flagship idiom; burst ref trained
                                      # clean, ref burstMahoGANy.py:732-771)
    pe_debias: int = 0                # >0: rounds of truth-free CNN
                                      # self-calibration on the posterior
                                      # cloud (round-trip templates at the
                                      # estimates through the CNN, subtract
                                      # the measured mean shift) — targets
                                      # the measured residual τ-bias of the
                                      # CNN on G draws (eval/posterior_post)
    pe_bootcal: int = 0               # >0: parametric-bootstrap calibration
                                      # of the cloud — debias + shrink to
                                      # the estimator's own noise-limited
                                      # width at the cloud's center
                                      # (posterior_post.bootstrap_calibrate)
    pe_mlrc: int = 0                  # >0: translate the cloud onto the
                                      # maximum-likelihood point (multi-start
                                      # Adam refinement of ‖d − s(θ)‖²) —
                                      # the truth-free analogue of the
                                      # measured oracle debias
                                      # (posterior_post.ml_recenter)
    reweight_temper: float = 0.0      # >0: importance-resample the cloud by
                                      # the residual likelihood of the data
                                      # given the template at each estimate
                                      # (temper = exponent; 1 = exact IS).
                                      # GAN cloud = proposal; scales beyond
                                      # the 2-D exact grid
    pe_no_norm: bool = True           # drop the reference's batch-max CNN
                                      # input normalization entirely (ref
                                      # burstMahoGANy.py:738). Whitened
                                      # units are already physical; batch-max
                                      # coupling makes every sample's scale
                                      # depend on the batch's noise peaks —
                                      # measured to bias τ low on noisy
                                      # inputs and to break the noise-
                                      # augmented CNN on clean ones
    freeze_on_res: float = 2e-5       # UNWEIGHTED residual-moment-loss
                                      # component of the combined early-stop
                                      # gate (see freeze_on_white): training
                                      # freezes when BOTH the eval draws'
                                      # residuals are white AND
                                      # res_loss/res_loss_weight is below
                                      # this. Compared after dividing out
                                      # res_loss_weight so the threshold
                                      # means the same raw residual loss at
                                      # any weight (measured at weight 10:
                                      # converged ~7e-6-1.2e-5 raw vs ≥5e-5
                                      # unconverged; either criterion alone
                                      # false-positives — res on a moment-
                                      # matched wrong morphology, whiteness
                                      # on 256-draw sampling luck).
                                      # ≤0 disables the res component.
    gan_restarts: int = 2             # random restarts: if the schedule
                                      # ends with no white state found
                                      # (convergence is event/seed
                                      # dependent — measured 1/3 seeds at
                                      # default), re-init the GAN with a
                                      # fresh key and rerun, up to this many
                                      # times. Truth-free (gated on the
                                      # whiteness criterion); the reference's
                                      # human-in-the-loop rerun workflow,
                                      # automated.
    freeze_on_white: float = 0.99     # truth-free early stopping on the
                                      # residual-whiteness score of the
                                      # eval-cadence posterior draws
                                      # (mean/var/Ljung-Box pass fraction,
                                      # the reference's own implicit
                                      # validation idiom — SURVEY §4.4):
                                      # freeze training at the first eval
                                      # whose draws leave h(t)−x white at
                                      # ≥ this score. Morphology-aware —
                                      # leftover signal in the residual
                                      # fails Ljung-Box — and uses only the
                                      # measured data, never the truth.
    anneal_frac: float = 0.0          # terminal anneal: for the last
                                      # anneal_frac of GAN iterations, freeze
                                      # D and zero the adversarial G term so
                                      # the FINAL state settles onto the
                                      # residual-route optimum (the
                                      # adversarial oscillation makes the
                                      # reference's "use the last iteration"
                                      # convention a lottery; this makes it
                                      # deterministic). Knobs are traced, so
                                      # the flip costs no recompile.
    select_best: str = ""             # "elbo": final posterior comes from the
                                      # eval-cadence state whose cloud scored
                                      # the highest ELBO E_q[logL] + H(q)
                                      # (= −KL(q‖exact posterior) + const,
                                      # truth-free — posterior_post.elbo_score)
                                      # instead of the last/frozen state.
                                      # Measured need: whiteness saturates at
                                      # 1.0 across late states whose overlaps
                                      # still range 0.76–0.93. "" = reference
                                      # last-iteration semantics
    select_route: str = ""            # "elbo": automatic calibration-route
                                      # selection per posterior draw — apply
                                      # the whole route library (raw/bootcal/
                                      # mlrc/mlrc_bootcal/±reweight), ELBO-
                                      # score each, keep the argmax
                                      # (posterior_post.select_route;
                                      # replaces the per-knob chain). "" =
                                      # use the individual pe_* knobs
    cnn_cache: str | None = None      # directory of reusable CNN-PE states:
                                      # the PE phase depends only on
                                      # (seed, pe config), so sweeps over GAN
                                      # recipes restore it instead of
                                      # retraining per variant
    eval_every: int = 1               # posterior draw + grid score every k-th
                                      # cadence point (cheap jitted metrics
                                      # still log at every cadence; same
                                      # split the flagship's eval_cadence
                                      # provides, ref did everything at :854)
    debug_probes: bool = False        # per-term GAN-step health metrics
                                      # (grad norms per route, logit
                                      # extremes, BN-var min) in the metrics
                                      # jsonl — the NaN bisect instrument
                                      # (train/gan.py)
    out_dir: str = "out/burst"
    seed: int = 0
    plots: bool = True


def run_burst_smoke(cfg: BurstSmokeConfig, mesh=None):
    """Full burst mahoGANy; returns summary dict incl. final grid-overlap."""
    if cfg.select_best not in ("", "elbo"):
        raise ValueError(f"select_best={cfg.select_best!r}: must be '' or "
                         "'elbo' (a typo would silently revert to "
                         "last-iteration semantics)")
    if cfg.select_route not in ("", "elbo"):
        raise ValueError(f"select_route={cfg.select_route!r}: must be '' or "
                         "'elbo' (a typo would silently fall back to the "
                         "per-knob calibration chain)")
    if cfg.freeze_on_res > 0 and cfg.freeze_on_white <= 0:
        raise ValueError(
            "freeze_on_res > 0 requires freeze_on_white > 0: the res "
            "criterion is only evaluated inside the whiteness gate, so a "
            "res-only config would silently never freeze")
    key = jax.random.PRNGKey(cfg.seed)
    k_bank, k_event, k_noise, key = jax.random.split(key, 4)
    os.makedirs(cfg.out_dir, exist_ok=True)
    log = MetricLogger(cfg.out_dir, "burst")

    # training bank + fixed event (ref: :581,614-631)
    bank, pars = make_burst_bank(k_bank, cfg.n_signals, N=cfg.n_pix)
    signal = sine_gaussian(0.5, 1.0 / 25.0, N=cfg.n_pix)  # default pars event
    measured = signal + cfg.n_sig * jax.random.normal(k_noise, signal.shape)
    truth = (0.5, 1.0 / 25.0)

    # exact grid posterior (ref: :716-726)
    L, gx, gy = gp.burst_grid_posterior(measured, cfg.n_sig, cfg.pe_grain)

    # ---- CNN PE (ref: :732-771) ----------------------------------------
    pe_cfg = CNNConfig(n_pix=cfg.n_pix, batch_size=cfg.batch_size, lr=cfg.lr,
                       noise_frac=cfg.pe_noise_frac,
                       noise_scale_max=2.0 * cfg.n_sig,
                       max_normalize=not cfg.pe_no_norm,
                       max_per_sample=cfg.per_sample_max)
    pe_model = BurstPE()
    pe_state = init_cnn(jax.random.PRNGKey(cfg.seed + 1), pe_model, pe_cfg)

    # the PE phase draws from its own key branch so a cache-restore (below)
    # leaves the GAN phase's stream untouched — no split-count bookkeeping
    k_pe, key = jax.random.split(key)

    cache_mgr = None
    if cfg.cnn_cache:
        # every field that changes what the trained CNN IS must be in the
        # key: lr and n_sig (noise_scale_max = 2*n_sig) included so a sweep
        # varying them never restores a mismatched cache entry
        tag = (f"s{cfg.seed}_i{cfg.pe_iters}_n{cfg.n_pix}_b{cfg.batch_size}"
               f"_sig{cfg.n_signals}_psm{int(cfg.per_sample_max)}"
               f"_lr{cfg.lr:g}_ns{cfg.n_sig:g}"
               + (f"_pnf{cfg.pe_noise_frac}" if cfg.pe_noise_frac else "")
               + ("_nonorm" if cfg.pe_no_norm else ""))
        cache_mgr = CheckpointManager(os.path.join(cfg.cnn_cache, tag), max_to_keep=1)
    restored = None
    if cache_mgr is not None and cache_mgr.latest_step() is not None:
        restored, _ = cache_mgr.restore(pe_state)
    if restored is not None:
        pe_state = restored
        print("CNN PE restored from cache")
    else:
        pe_chunk = cfg.cadence if (cfg.cadence > 1 and cfg.pe_iters % cfg.cadence == 0) else 1
        if pe_chunk > 1:
            from gennet_tpu.train.cnn import make_cnn_step_scan

            pe_step = make_cnn_step_scan(pe_model, pe_cfg, pe_chunk, mesh=mesh)
        else:
            pe_step = make_cnn_step(pe_model, pe_cfg, mesh=mesh)
        for i0 in range(0, cfg.pe_iters, pe_chunk):
            k_pe, sub = jax.random.split(k_pe)
            pe_state, m = pe_step(pe_state, bank, pars, sub)
            if pe_chunk > 1:
                m = {k: v[-1] for k, v in m.items()}
            i = i0 + pe_chunk if pe_chunk > 1 else i0
            if i % cfg.cadence == 0 and i > 0:
                log.log(i, m)
                print(log.status_line(i, m, log.steps_per_sec(i)))
        if cache_mgr is not None:
            cache_mgr.save(cfg.pe_iters, pe_state)

    # PE accuracy on the bank
    est = np.asarray(cnn_predict(pe_model, pe_state, bank[:4000]))
    rms = [float(np.mean((np.asarray(pars[:4000, k]) - est[:, k]) ** 2)) for k in range(2)]
    pe_std = [float(np.mean(np.abs(np.asarray(pars[:4000, k]) - est[:, k]))) for k in range(2)]
    print(f"Completed CNN PE  RMS: {rms[0]:f},{rms[1]:f}")

    # ---- GAN (ref: :779-899) --------------------------------------------
    inoise = cfg.n_sig if cfg.instance_noise < 0 else cfg.instance_noise
    gan_cfg = GANConfig(n_pix=cfg.n_pix, batch_size=cfg.batch_size, lr=cfg.lr,
                        n_sig=cfg.n_sig, pair_discriminator=False, residual_route=True,
                        label_smoothing=cfg.label_smoothing, d_instance_noise=inoise,
                        d_lr_scale=cfg.d_lr_scale, d_acc_gate=cfg.d_acc_gate,
                        diversity_weight=cfg.diversity_weight,
                        r1_gamma=cfg.r1_gamma,
                        res_loss_weight=cfg.res_loss_weight,
                        g_ema_decay=cfg.g_ema_decay,
                        debug_probes=cfg.debug_probes)
    G = BurstGenerator(n_out=cfg.n_pix)
    D = BurstDiscriminator()
    gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 2), G, D, gan_cfg)
    # fuse one cadence of steps into a single dispatched program (the remote
    # per-call latency otherwise dominates batch-64 step compute)
    chunk = cfg.cadence if (cfg.cadence > 1 and cfg.gan_iters % cfg.cadence == 0) else 1
    if chunk > 1:
        from gennet_tpu.train.gan import make_gan_step_scan

        gan_step_fn = make_gan_step_scan(G, D, gan_cfg, chunk, mesh=mesh)
    else:
        gan_step_fn = make_gan_step(G, D, gan_cfg, mesh=mesh)

    from collections import deque

    from gennet_tpu.train.cnn import normalize_max

    snapshots = deque(maxlen=max(1, cfg.n_snapshots))

    # posterior sampler: optionally a weaker-dropout clone of G (same params;
    # GaussianDropout carries none)
    if cfg.posterior_drate >= 0.0:
        G_samp = BurstGenerator(n_out=cfg.n_pix, drate=cfg.posterior_drate)
        samp_dropout = True
    else:
        G_samp, samp_dropout = G, cfg.posterior_dropout

    def draw_posterior(states, key):
        """Posterior cloud pooled over snapshot states (snapshot-ensemble
        sampling across the adversarial oscillation)."""
        per = cfg.n_posterior if len(states) == 1 else max(cfg.n_posterior // len(states), 64)
        parts = []
        for snap in states:
            key, sub = jax.random.split(key)
            parts.append(sample_generator(G_samp, snap, sub, per, gan_cfg,
                                          dropout=samp_dropout,
                                          temp=cfg.posterior_temp))
        wf = jnp.concatenate(parts, axis=0)
        wf_in = wf
        if cfg.posterior_noise > 0:
            # parametric bootstrap: fresh measurement-scale noise on each
            # draw, dispersing the estimates by the likelihood's own width
            key, kn = jax.random.split(key)
            wf_in = wf + cfg.posterior_noise * cfg.n_sig * jax.random.normal(
                kn, wf.shape, wf.dtype)
        samples = np.asarray(cnn_predict(pe_model, pe_state, normalize_max(wf_in, pe_cfg)))
        route_elbo = None  # select_route's score for the returned cloud
        if cfg.select_route == "elbo":
            from gennet_tpu.eval import posterior_post as pp

            synth = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=cfg.n_pix)
            cnn = lambda w: cnn_predict(pe_model, pe_state,
                                        normalize_max(w, pe_cfg))
            key, ks = jax.random.split(key)
            route, samples, scores = pp.select_route(
                samples, synth, cnn, measured, cfg.n_sig, ks,
                temper=(cfg.reweight_temper if cfg.reweight_temper > 0
                        else 1.0))
            route_elbo = scores[route]
            print(f"auto route: {route} (ELBO {route_elbo:.1f})")
        elif (cfg.pe_debias > 0 or cfg.pe_bootcal > 0 or cfg.pe_mlrc > 0
                or cfg.reweight_temper > 0):
            from gennet_tpu.eval import posterior_post as pp

            synth = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=cfg.n_pix)
            cnn = lambda w: cnn_predict(pe_model, pe_state,
                                        normalize_max(w, pe_cfg))
            if cfg.pe_debias > 0:
                key, kd = jax.random.split(key)
                samples = pp.self_calibrate(samples, synth, cnn, kd,
                                            cfg.n_sig, rounds=cfg.pe_debias)
            if cfg.pe_bootcal > 0:
                key, kb = jax.random.split(key)
                samples = pp.bootstrap_calibrate(samples, synth, cnn, kb,
                                                 cfg.n_sig)
            if cfg.pe_mlrc > 0:
                key, km = jax.random.split(key)
                samples = pp.ml_recenter(samples, synth, measured, km)
            if cfg.reweight_temper > 0:
                key, kr = jax.random.split(key)
                ess = pp.effective_sample_size(samples, synth, measured,
                                               cfg.n_sig, cfg.reweight_temper)
                samples = pp.likelihood_resample(samples, synth, measured,
                                                 cfg.n_sig, kr,
                                                 temper=cfg.reweight_temper)
                print(f"likelihood resample ESS: {ess:.1f}/{len(samples)}")
        return wf, samples, route_elbo

    from gennet_tpu.train.gan import knobs_from_cfg

    base_knobs = knobs_from_cfg(gan_cfg)
    anneal_knobs = base_knobs.replace(
        d_acc_gate=jnp.asarray(-1.0, jnp.float32),    # never update D
        adv_weight=jnp.asarray(0.0, jnp.float32))     # residual route only
    anneal_start = int(cfg.gan_iters * (1.0 - cfg.anneal_frac))

    score = 0.0
    best_score = -1.0
    sel_score, sel_states, sel_step = float("-inf"), None, None
    best_state = gan_state
    n_cad = 0
    frozen_at = None
    log.steps_per_sec(0)  # reset the steps/sec window for the GAN phase
    # Restart policy: up to gan_restarts fresh-init attempts if a full
    # schedule ends with no frozen (whiteness-converged) state — the
    # reference's human rerun workflow, automated. best_score/best_state
    # deliberately persist ACROSS attempts (they are diagnostics over the
    # whole campaign); snapshots and the cadence counter reset per attempt
    # because pooled clouds must not mix generators from different inits.
    max_attempts = 1 + (cfg.gan_restarts if cfg.freeze_on_white > 0 else 0)
    for attempt in range(max_attempts):
        if attempt:
            print(f"schedule ended unconverged — random restart {attempt}")
            gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 1000 + attempt),
                                 G, D, gan_cfg)
            snapshots.clear()
            n_cad = 0
            # the on-disk cloud history must stay a SINGLE trajectory:
            # clear the abandoned attempt's snapshots so offline tooling
            # never mixes clouds from different generator inits
            import glob as _glob

            for p in _glob.glob(os.path.join(
                    cfg.out_dir, "GAN_posterior_samples",
                    "posterior_samples_*.npz")):
                os.remove(p)
        for i0 in range(0, cfg.gan_iters, chunk):
            key, sub = jax.random.split(key)
            knobs = anneal_knobs if (cfg.anneal_frac > 0 and i0 >= anneal_start) else base_knobs
            gan_state, m = gan_step_fn(gan_state, bank, measured, sub, knobs)
            if chunk > 1:
                m = {k: v[-1] for k, v in m.items()}
            i = i0 + chunk if chunk > 1 else i0
            if i % cfg.cadence == 0 and i > 0:
                log.log(i, m)
                print(log.status_line(i, m, log.steps_per_sec(i)))
                n_cad += 1
                if n_cad % max(1, cfg.snapshot_every) == 0:
                    snapshots.append(gan_state)
                if n_cad % max(1, cfg.eval_every) != 0:
                    continue
                key, sub = jax.random.split(key)
                eval_states = list(snapshots) or [gan_state]
                wf, samples, route_elbo = draw_posterior(eval_states, sub)
                # persist the cloud (flagship parity): offline postproc /
                # rescue tooling scores saved clouds without retraining
                save_posterior_snapshot(
                    os.path.join(cfg.out_dir, "GAN_posterior_samples"),
                    i, np.asarray(samples))
                # cloud diagnostics vs the exact grid: bias (mean offset in
                # exact-σ units) and dispersion ratio per parameter — these
                # separate "biased cloud" from "collapsed/over-dispersed cloud"
                # failure modes at a glance
                gm = gp.grid_moments(np.asarray(L), gx, gy)
                _wf2d = np.asarray(wf).reshape(np.asarray(wf).shape[0], -1)
                diag = {
                    "bias_t0": (float(samples[:, 0].mean()) - gm[0]) / max(gm[2], 1e-12),
                    "bias_tau": (float(samples[:, 1].mean()) - gm[1]) / max(gm[3], 1e-12),
                    "disp_t0": float(samples[:, 0].std()) / max(gm[2], 1e-12),
                    "disp_tau": float(samples[:, 1].std()) / max(gm[3], 1e-12),
                    "wf_corr": float(np.mean(
                        np.sum(_wf2d * np.asarray(signal)[None, :], axis=1)
                        / (np.linalg.norm(_wf2d, axis=1)
                           * np.linalg.norm(np.asarray(signal)) + 1e-30))),
                }
                # degenerate-output guard (ref: bbhMahoGANy.py:1354-1355)
                if samples[:, 0].var() > 0 and samples[:, 1].var() > 0:
                    score = gp.grid_overlap_score(samples, np.asarray(L), gx, gy)
                    diag["grid_overlap"] = score
                    print(f"grid overlap: {score:.4f}  "
                          f"bias: ({diag['bias_t0']:+.2f}, {diag['bias_tau']:+.2f})σ  "
                          f"disp: ({diag['disp_t0']:.2f}, {diag['disp_tau']:.2f})×  "
                          f"wf_corr: {diag['wf_corr']:.4f}")
                    if score > best_score:
                        best_score, best_state = score, gan_state
                    if cfg.select_best == "elbo":
                        # inside the degeneracy guard: a collapsed cloud
                        # must never be selectable. Reuse select_route's
                        # score when it already ranked this exact cloud.
                        from gennet_tpu.eval import posterior_post as pp

                        elbo = route_elbo if route_elbo is not None else \
                            pp.elbo_score(
                                samples,
                                lambda s: sine_gaussian(s[:, 0], s[:, 1],
                                                        N=cfg.n_pix),
                                measured, cfg.n_sig)
                        if np.isfinite(elbo):
                            diag["elbo"] = elbo
                        print(f"cloud ELBO: {elbo:.1f}")
                        if elbo > sel_score:
                            # record the exact state LIST that produced the
                            # scored cloud (snapshot pooling included)
                            sel_score, sel_states, sel_step = \
                                elbo, eval_states, i
                if cfg.freeze_on_white > 0 and frozen_at is None:
                    from gennet_tpu.eval.whiteness import posterior_whiteness

                    # gate on the posterior-MEAN waveform's residual: per-draw
                    # residuals carry the cloud's dispersion by construction
                    # (audited r5; see eval/whiteness.posterior_whiteness)
                    ws = posterior_whiteness(np.asarray(measured) / cfg.n_sig,
                                             _wf2d[:256] / cfg.n_sig, 1.0)
                    w = (ws["mean_pass"] + ws["var_pass"] + ws["ljung_box_pass"]) / 3.0
                    diag["whiteness"] = w
                    # combined gate: white residual draws AND a converged
                    # residual-moment loss (whiteness alone false-positives on
                    # 256 draws — measured: froze a τ-biased corr-0.79 state)
                    res_raw = float(m["res_loss"]) / max(cfg.res_loss_weight, 1e-30)
                    res_ok = (cfg.freeze_on_res <= 0
                              or 0.0 < res_raw < cfg.freeze_on_res)
                    if w >= cfg.freeze_on_white and res_ok:
                        frozen_at = i
                        log.log(i, diag)
                        print(f"residuals white ({w:.3f} ≥ {cfg.freeze_on_white},"
                              f" raw res_loss {res_raw:.2e}) "
                              f"— training frozen at {i}")
                        break
                log.log(i, diag)
                if cfg.plots:
                    from gennet_tpu.eval import plots as P

                    P.plot_waveform_est(signal, measured, np.asarray(wf), cfg.out_dir, i)
                    P.plot_pe_samples(samples, truth, cfg.out_dir, i, grid=(L, gx, gy))
                    P.plot_losses(log.arrays(), cfg.out_dir)
        if frozen_at is not None:
            break

    # FINAL-state scoring — the reference uses whatever the last iteration
    # produced (ref: bbhMahoGANy.py:1241); the training recipe must keep the
    # final state healthy, with best-state kept only as a diagnostic
    whiteness = None
    final_score = 0.0
    sel_route_name = None
    sel_info = None
    if cfg.gan_iters > 0:
        key, sub = jax.random.split(key)
        if cfg.n_snapshots <= 1:
            final_states = [gan_state]          # reference behavior
        else:
            final_states = list(snapshots) or [gan_state]
            if final_states[-1] is not gan_state:
                final_states.append(gan_state)
        wf, samples, _ = draw_posterior(final_states, sub)
        if cfg.select_best == "elbo":
            # candidate-library selection (posterior_post.select_final_cloud):
            # the trained-final cloud competes against the saved per-eval
            # clouds, their ELBO-plateau pool, and smoothed likelihood
            # resamples of the pooled proposals — all truth-free. Measured
            # (r5, mlrc_sel seeds): the single-snapshot argmax picks KL-best
            # but tau-collapsed states; the library restores the pooled /
            # resampled alternatives as first-class candidates.
            import glob as _glob

            from gennet_tpu.eval import posterior_post as pp

            synth = lambda s: sine_gaussian(
                jnp.asarray(s)[:, 0], jnp.asarray(s)[:, 1], N=cfg.n_pix)
            clouds = {}
            for p in _glob.glob(os.path.join(
                    cfg.out_dir, "GAN_posterior_samples",
                    "posterior_samples_*.npz")):
                step = int(p.rsplit("_", 1)[1].split(".")[0])
                if step <= cfg.gan_iters:  # skip a previous run's final (+1)
                    clouds[step] = np.load(p)["samples"]
            key, ksel = jax.random.split(key)
            sel_route_name, chosen, sel_info = pp.select_final_cloud(
                clouds, synth, measured, cfg.n_sig, ksel,
                extra={"final": np.asarray(samples)},
                # search-window prior = the exact grid's parameter box
                # (burst_grid_posterior defaults)
                bounds=((0.25, 0.75), (1.0 / 60.0, 1.0 / 15.0)))
            if chosen is not None and sel_route_name != "final":
                samples = chosen
                wf = jnp.asarray(np.asarray(synth(samples[:256]),
                                            np.float32))
            if sel_info:
                print(f"library-selected posterior: {sel_route_name} "
                      f"(scores {{"
                      + ", ".join(f"{k}: {v:.1f}"
                                  for k, v in sel_info["scores"].items())
                      + f"}}, plateau K={len(sel_info.get('plateau_members', []))}, "
                      f"pool ESS {sel_info.get('pool_ess', 0.0):.0f})")
        save_posterior_snapshot(
            os.path.join(cfg.out_dir, "GAN_posterior_samples"),
            cfg.gan_iters + 1, np.asarray(samples))  # +1 = the final cloud
        if samples[:, 0].var() > 0 and samples[:, 1].var() > 0:
            final_score = gp.grid_overlap_score(samples, np.asarray(L), gx, gy)
        log.log(cfg.gan_iters, {"grid_overlap_final": final_score})
        print(f"final-state grid overlap: {final_score:.4f}")
        # residual-whiteness gate (SURVEY idiom 4): h(t) − x_gen should be
        # N(0, n_sig²) white
        from gennet_tpu.eval.whiteness import posterior_whiteness

        whiteness = posterior_whiteness(np.asarray(measured) / cfg.n_sig,
                                        np.asarray(wf) / cfg.n_sig, 1.0)
        print(f"residual whiteness: {whiteness}")
        if cfg.plots:
            from gennet_tpu.eval import plots as P

            P.plot_waveform_est(signal, measured, np.asarray(wf), cfg.out_dir,
                                cfg.gan_iters, fname="waveform_final.png")
            P.plot_pe_samples(samples, truth, cfg.out_dir, cfg.gan_iters,
                              grid=(L, gx, gy), fname="pe_samples_final.png")

    log.close()
    return {"rms": rms, "pe_std": pe_std,
            "grid_overlap": final_score,          # final-state score (the gate)
            "grid_overlap_best": best_score,      # best cadence state (diagnostic)
            "frozen_at": frozen_at,               # early-stop step (None = ran full)
            "selected_at": sel_step,              # in-run ELBO argmax step (diagnostic)
            "selected_route": sel_route_name,     # library candidate chosen (None = off)
            "pool_ess": (sel_info or {}).get("pool_ess"),
            "plateau_k": len((sel_info or {}).get("plateau_members", [])) or None,
            "whiteness": whiteness}


@dataclass
class BlobToyConfig:
    """Gen-1 image-toy workload (ref: tests/ganymede.py:31-64,494-740)."""

    n_pix: int = 28
    n_signals: int = 10_000
    n_sig: float = 0.3
    batch_size: int = 64
    pe_iters: int = 2_000
    mc_pe_iters: int = 2_000
    gan_iters: int = 2_000
    n_mc_draws: int = 1000         # MC-dropout posterior draws (ref: :617-620)
    rms_gate: float = 5e-4         # convergence gate (ref: :626)
    lr: float = 2e-4
    cadence: int = 200
    out_dir: str = "out/blob"
    seed: int = 0
    plots: bool = True


def run_blob_toy(cfg: BlobToyConfig, mesh=None):
    """Blob-image workload: exact grid posterior, deterministic PE trained to
    the RMS gate, MC-dropout PE posterior on the noisy event, image GAN.

    Returns summary: pe RMS, MC-dropout posterior overlap vs grid, GAN
    losses."""
    import optax

    from gennet_tpu.models.image_models import ImageMCDropoutPE, ImagePE
    from gennet_tpu.physics.blobs import blob_grid_posterior, make_blob_bank

    key = jax.random.PRNGKey(cfg.seed)
    os.makedirs(cfg.out_dir, exist_ok=True)
    log = MetricLogger(cfg.out_dir, "blob")

    k_bank, k_ev, k_noise, key = jax.random.split(key, 4)
    bank, pars = make_blob_bank(k_bank, cfg.n_signals, cfg.n_pix)
    signal = bank[0]
    truth = np.asarray(pars[0])
    noise = cfg.n_sig * jax.random.normal(k_noise, signal.shape)
    measured = signal + noise
    L, gx, gy = blob_grid_posterior(measured, cfg.n_sig, grain=cfg.n_pix)

    bank4 = bank[..., None]
    noisy_bank = bank4 + cfg.n_sig * jax.random.normal(k_ev, bank4.shape)

    # ---- deterministic PE to the RMS convergence gate (ref: :626) -------
    pe = ImagePE()
    pe_vars = pe.init({"params": jax.random.PRNGKey(cfg.seed + 1)}, bank4[:1], train=False)
    opt = optax.adam(cfg.lr, b1=0.5)
    opt_state = opt.init(pe_vars["params"])

    @jax.jit
    def pe_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = pe.apply({"params": p}, x, train=True)
            return jnp.sum(jnp.mean((pred - y) ** 2, axis=0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params = pe_vars["params"]
    rms = [1.0, 1.0]
    for i in range(cfg.pe_iters):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (cfg.batch_size,), 0, bank.shape[0])
        params, opt_state, loss = pe_step(params, opt_state, bank4[idx], pars[idx])
        if i % cfg.cadence == 0 and i > 0:
            est = np.asarray(pe.apply({"params": params}, bank4[:2000], train=False))
            rms = [float(np.mean((np.asarray(pars[:2000, k]) - est[:, k]) ** 2)) for k in range(2)]
            log.log(i, {"pe_loss": float(loss), "rms0": rms[0], "rms1": rms[1]})
            print(f"{i}: [PE loss: {float(loss):f}, RMS: {rms[0]:f},{rms[1]:f}]")
            if max(rms) < cfg.rms_gate:  # the reference's while-gate
                break

    # ---- MC-dropout PE on noisy inputs + posterior draws ----------------
    mc = ImageMCDropoutPE()
    mc_vars = mc.init({"params": jax.random.PRNGKey(cfg.seed + 2),
                       "dropout": jax.random.PRNGKey(0)}, bank4[:1], train=False)
    mc_opt_state = opt.init(mc_vars["params"])

    @jax.jit
    def mc_step(params, opt_state, x, y, rng):
        def loss_fn(p):
            pred = mc.apply({"params": p}, x, train=True, rngs={"dropout": rng})
            return jnp.sum(jnp.mean((pred - y) ** 2, axis=0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    mc_params = mc_vars["params"]
    for i in range(cfg.mc_pe_iters):
        key, k_idx, k_drop = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, bank.shape[0])
        mc_params, mc_opt_state, mc_loss = mc_step(mc_params, mc_opt_state,
                                                   noisy_bank[idx], pars[idx], k_drop)
        if i % cfg.cadence == 0 and i > 0:
            log.log(i, {"mc_pe_loss": float(mc_loss)})

    # 1000 stochastic predictions of the single measured image (ref: :617-620)
    @jax.jit
    def mc_draw(rng):
        return mc.apply({"params": mc_params}, measured[None, ..., None],
                        train=False, rngs={"dropout": rng})[0]

    draws = np.asarray(jax.vmap(mc_draw)(jax.random.split(key, cfg.n_mc_draws)))
    mc_overlap = gp.grid_overlap_score(draws, np.asarray(L), gx, gy)
    print(f"MC-dropout posterior grid overlap: {mc_overlap:.4f}")

    # ---- image GAN (subtraction scheme on images) -----------------------
    from gennet_tpu.models.image_models import FlatImageDiscriminator, FlatImageGenerator

    gan_cfg = GANConfig(n_pix=cfg.n_pix * cfg.n_pix, batch_size=cfg.batch_size,
                        lr=cfg.lr, n_sig=cfg.n_sig, pair_discriminator=False,
                        residual_route=True)
    # image models take (B, n, n, 1); the shared flatten wrappers adapt them
    # to the 1-D GAN step
    FlatG = FlatImageGenerator(n_pix=cfg.n_pix)
    FlatD = FlatImageDiscriminator(n_pix=cfg.n_pix)
    flat_bank = bank.reshape(bank.shape[0], -1)
    flat_measured = measured.reshape(-1)
    gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 3), FlatG, FlatD, gan_cfg)
    gstep = make_gan_step(FlatG, FlatD, gan_cfg, mesh=mesh)
    gm = {}
    for i in range(cfg.gan_iters):
        key, sub = jax.random.split(key)
        gan_state, gm = gstep(gan_state, flat_bank, flat_measured, sub)
        if i % cfg.cadence == 0 and i > 0:
            log.log(i, gm)
            print(log.status_line(i, gm, log.steps_per_sec(i)))

    log.close()
    return {
        "pe_rms": rms,
        "mc_overlap": float(mc_overlap),
        "gan_d_loss": float(gm.get("d_loss", np.nan)),
    }


@dataclass
class ImageGANConfig:
    """Gen-1 image-directory GAN mode (ref: tests/ganymede.py:64,272-314 —
    the face-image path over tests/data/gwbush/*.jpg; this repo commits a
    deterministic 16-image stand-in fixture set under tests/data/images/,
    regenerable via scripts/make_image_fixtures.py). The reference forbids
    PE for non-parametric image signals (ganymede.py:59-61), so this
    workload is GAN-only: recover a noisy measured image via the
    subtraction-residual scheme."""

    image_glob: str = "tests/data/images/*.jpg"
    n_pix: int = 32                # resized image side (divisible by 4)
    n_sig: float = 0.3
    batch_size: int = 32
    gan_iters: int = 2_000
    lr: float = 2e-4
    cadence: int = 100
    flip: bool = True              # append horizontally-flipped copies
    out_dir: str = "out/image_gan"
    seed: int = 0
    plots: bool = True


def run_image_gan(cfg: ImageGANConfig, mesh=None):
    """Image-directory GAN: load images, bury one in noise, train the
    residual-route GAN to recover it. Returns losses + recovery corr."""
    from gennet_tpu.data.images import load_image_dir
    from gennet_tpu.models.image_models import FlatImageDiscriminator, FlatImageGenerator

    key = jax.random.PRNGKey(cfg.seed)
    os.makedirs(cfg.out_dir, exist_ok=True)
    log = MetricLogger(cfg.out_dir, "image_gan")

    imgs = load_image_dir(cfg.image_glob, cfg.n_pix, flip=cfg.flip)  # (N, n, n, 1)
    bank = jnp.asarray(imgs.reshape(imgs.shape[0], -1))
    k_noise, key = jax.random.split(key)
    signal = bank[0]
    measured = signal + cfg.n_sig * jax.random.normal(k_noise, signal.shape)

    gan_cfg = GANConfig(n_pix=cfg.n_pix * cfg.n_pix, batch_size=cfg.batch_size,
                        lr=cfg.lr, n_sig=cfg.n_sig, pair_discriminator=False,
                        residual_route=True)
    FlatG = FlatImageGenerator(n_pix=cfg.n_pix)
    FlatD = FlatImageDiscriminator(n_pix=cfg.n_pix)
    gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 1), FlatG, FlatD, gan_cfg)
    gstep = make_gan_step(FlatG, FlatD, gan_cfg, mesh=mesh)

    gm = {}
    for i in range(cfg.gan_iters):
        key, sub = jax.random.split(key)
        gan_state, gm = gstep(gan_state, bank, measured, sub)
        if i % cfg.cadence == 0 and i > 0:
            log.log(i, gm)
            print(log.status_line(i, gm, log.steps_per_sec(i)))

    # recovery check: mean generated image vs the clean signal
    key, sub = jax.random.split(key)
    gen = sample_generator(FlatG, gan_state, sub, 64, gan_cfg)
    mean_gen = np.asarray(jnp.mean(gen, axis=0))
    sig_np = np.asarray(signal)
    corr = float(np.corrcoef(mean_gen, sig_np)[0, 1])
    if cfg.plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        for ax, (arr, title) in zip(axes, [
            (sig_np, "signal"), (np.asarray(measured), "measured"),
            (mean_gen, "mean generated"),
        ]):
            ax.imshow(arr.reshape(cfg.n_pix, cfg.n_pix), cmap="gray")
            ax.set_title(title)
            ax.axis("off")
        fig.savefig(os.path.join(cfg.out_dir, "image_gan_recovery.png"), dpi=150)
        plt.close(fig)

    log.close()
    return {
        "n_images": int(bank.shape[0]),
        "recovery_corr": corr,
        "gan_d_loss": float(gm.get("d_loss", np.nan)),
        "gan_g_loss": float(gm.get("g_loss", np.nan)),
    }


@dataclass
class BBHConfig:
    """Flagship workload config (ref defaults: bbhMahoGANy.py:83-113)."""

    n_pix: int = 1024
    training_num: int = 50_000
    batch_size: int = 8
    pe_batch_size: int = 8
    gan_iters: int = 500_000
    pe_iters: int = 500_000
    lr: float = 9e-5
    gan_lr: float = 0.0                 # >0: GAN-only lr override. `lr` feeds
                                        # BOTH the CNN PE and the GAN; the r5
                                        # r4flag_b64 screen proved retuning the
                                        # shared lr for a batch-64 GAN silently
                                        # retrains the PE at the hot lr (cache
                                        # tag carries lr) and zeroes the CNN
                                        # sanity bound — batch-size evidence
                                        # needs this decoupled knob
    cadence: int = 100                  # cheap jitted metrics: logged at EVERY
                                        # cadence point for the whole run
    eval_cadence: int = 1000            # expensive path: posterior draws, β,
                                        # whiteness, plots, snapshots (the
                                        # reference did all of it every 100,
                                        # ref: :1302-1381 — separated here so
                                        # long runs keep full observability
                                        # without paying the eval cost)
    pe_cadence: int = 1000
    n_posterior: int = 4000
    chi_loss: bool = False
    comb_pe_model: bool = False         # single-net PE variant (ref: :105)
    bf16: bool = False                  # bfloat16 compute in G/D (MXU fast
                                        # path; params stay float32)
    conv_impl: str = "xla"              # 'xla' (nn.Conv) or 'pallas' (the
                                        # ops.pallas_conv1d MXU kernel);
                                        # param trees identical either way
    posterior_dropout: bool = True      # MC-dropout posterior sampling: keep
                                        # generator dropout active in draws
                                        # (the method lineage's variational
                                        # sampler, ref: ganymede PermaDropout
                                        # :617-620) — restores the posterior
                                        # dispersion that latent variation
                                        # alone under-represents
    posterior_bn_mode: str = "eval"     # 'eval' = BN running averages (the
                                        # reference's predict); 'batch' = BN
                                        # batch statistics, the mode the
                                        # generator was optimized in —
                                        # measured fix for the +8.8σ
                                        # eval-mode bias on the r2 state
                                        # (scripts/bbh_sampler_calibration)
    g_norm: str = "batch"               # generator normalization: 'batch'
                                        # (reference), 'group', 'none' —
                                        # batch-independent choices close the
                                        # train/eval gap structurally
                                        # (param trees differ; new runs only)
    pe_ema_decay: float = 0.999         # EMA of CNN params for every eval
                                        # (sanity cloud + posterior draws):
                                        # the r2 sanity bound oscillated
                                        # 0.02–0.94 across late cadences —
                                        # the averaged late-state is the
                                        # stable quality ceiling (0 = off)
    pe_lr_decay: bool = True            # cosine-decay the CNN LR over
                                        # pe_iters to 0.1·lr (constant-LR
                                        # batch-8 SGD never settles; ref
                                        # trains constant 9e-5, ref :98)
    label_smoothing: bool = True        # GAN stabilization pair (see burst)
    instance_noise: float = 0.3         # TPU-measured optimum for the pair
                                        # scheme: at n_sig(=1.0) the residual
                                        # channel is blurred into uselessness
                                        # and G mode-collapses to wrong
                                        # masses; at 0.3 the generator
                                        # recovers the event waveform
                                        # (corr 0.95) with healthy diversity
    d_lr_scale: float = 0.5             # slow D for long-run stability
    d_acc_gate: float = 0.9             # adaptive D/G balance: skip D updates
                                        # while its (synced) batch accuracy ≥
                                        # gate — prevents the d_acc=1.0
                                        # saturation a fixed 500k schedule
                                        # drifts into (the reference's run
                                        # oscillates but never pegs,
                                        # ref: bbhMahoGANy.py:1241-1382)
    diversity_weight: float = 0.0       # mode-seeking regularizer on G
    r1_gamma: float = 0.0               # R1 gradient penalty on D
    res_loss_weight: float = 0.0        # >0 adds the burst scheme's residual-
                                        # moment route to the flagship (the
                                        # reference's BBH version is pair-D
                                        # only; this generalizes the burst
                                        # 3-loss scheme, ref: :798-802, and
                                        # is what the terminal anneal polishes
                                        # the generator with)
    res_eval_mode: bool = True          # residual route on EVAL-mode G
                                        # output (see GANConfig.res_eval_mode:
                                        # constrains the mode the posterior
                                        # sampler actually draws from — r2's
                                        # eval draws were +8.8σ biased
                                        # because only train mode ever saw a
                                        # loss). Needs res_loss_weight > 0.
    posterior_drate: float = -1.0       # if ≥0: posterior draws through a G
                                        # clone with THIS dropout rate
                                        # (dispersion calibrator: full
                                        # training dropout measured 3.0–3.1×
                                        # over-dispersed on the r2 state)
    anneal_frac: float = 0.0            # terminal anneal (see burst config);
                                        # needs res_loss_weight > 0 to keep a
                                        # G gradient during the annealed tail
    freeze_on_res: float = 0.0          # UNWEIGHTED res-loss component of
                                        # the combined early-stop gate (see
                                        # burst config: freeze when draws
                                        # are white AND res_raw < this;
                                        # ≤0 disables the res component;
                                        # requires res_loss_weight > 0)
    freeze_on_white: float = 0.0        # truth-free early stop on the eval-
                                        # cadence residual-whiteness score
                                        # (see burst config; morphology-
                                        # aware, uses only measured data)
    g_ema_decay: float = 0.0            # EMA of G params (see burst note:
                                        # measured harmful at these scales)
    debug_probes: bool = False          # per-term GAN-step health metrics
                                        # (grad norms per route, logit
                                        # extremes, BN-var min) in the
                                        # metrics jsonl — the NaN bisect
                                        # instrument (train/gan.py)
    res_spectral_bands: int = 0         # >0: frequency-resolved residual
                                        # whiteness target with this many
                                        # bands (see GANConfig) — the r4
                                        # analytic replacement for the pair
                                        # channel's whiteness discrimination
    pair_d: bool = True                 # True = reference subtraction-pair D
                                        # (ref: bbhMahoGANy.py:1267-1289).
                                        # False = D judges the waveform
                                        # channel only and the analytic
                                        # residual-moment route carries ALL
                                        # whiteness pressure — the r4 fix for
                                        # the proven D memorization of the
                                        # one fixed event-noise realization
                                        # (scripts/d_memorization_probe.py:
                                        # a PERFECT generator's pair scores
                                        # P(real)=0.008; no G can win the
                                        # pair game). Needs res_loss_weight>0.
    twin_boost: int = 0                 # >0: append this many copies of the
                                        # event-twin template to the GAN's
                                        # REAL bank (CNN PE set stays
                                        # twin-free). The reference deletes
                                        # the twin from the real set (ref:
                                        # bbhMahoGANy.py:1031-1037), which
                                        # the r4 memorization probe measured
                                        # as an anti-truth cue: D scores the
                                        # true waveform −1.7 logits below
                                        # bank templates because the ONLY
                                        # waveform never seen as real is
                                        # G's exact target, so adversarial
                                        # pressure actively repels G from
                                        # the truth. Boosting restores real
                                        # density at the truth point using
                                        # no information beyond what the
                                        # bank maker already used (the twin
                                        # is constructed from the event's
                                        # published parameters, ref:
                                        # gw_template_maker.py:729-739).
                                        # 0 = reference-parity exclusion.
    posterior_temp: float = 1.0         # latent temperature for draws
    posterior_noise: float = 0.0        # fresh N(0, this·n_sig) noise on each
                                        # draw before the CNN (parametric
                                        # bootstrap; see burst config)
    n_snapshots: int = 1                # posterior pooled over k recent
                                        # eval-cadence states (1 = reference)
    pe_debias: int = 0                  # rounds of truth-free CNN
                                        # self-calibration on the cloud
                                        # (eval/posterior_post.py)
    pe_bootcal: int = 0                 # >0: parametric-bootstrap cloud
                                        # calibration (debias + shrink to the
                                        # estimator's noise-limited width at
                                        # the cloud center) — targets the
                                        # measured 3–4.6× over-dispersion of
                                        # the r2 MC-dropout sampler
    pe_mlrc: int = 0                    # >0: translate the cloud onto the
                                        # refined maximum-likelihood (mc, q)
                                        # point (posterior_post.ml_recenter)
    reweight_temper: float = 0.0        # >0: residual-likelihood importance
                                        # resampling of the cloud (templates
                                        # at the (mc,q) estimates vs the
                                        # measured series; GAN cloud =
                                        # proposal; ESS logged)
    select_best: str = ""               # "elbo": final posterior comes from
                                        # the eval-cadence state whose cloud
                                        # scored the highest ELBO
                                        # E_q[logL] + H(q) (truth-free; see
                                        # burst config / posterior_post.
                                        # elbo_score). "" = reference
                                        # last-iteration semantics
    select_route: str = ""              # "elbo": automatic calibration-route
                                        # selection per draw (see burst
                                        # config; posterior_post.select_route
                                        # replaces the per-knob chain)
    grid_grain: int = 95                # exact-grid posterior resolution for
                                        # the synthetic event (0 = disable)
    n_sig: float = 1.0
    n_sig_event: bool = True            # use the event's ACTUAL noise std in
                                        # normalized units — which is exactly
                                        # the norm constant: make_event draws
                                        # unit whitened noise then scales by
                                        # norm = 1/std(measured), so the
                                        # residual floor sits at std=norm
                                        # (≈0.66), NOT n_sig=1. Truth-free
                                        # (std(measured) is observed). With
                                        # False, every residual/whiteness
                                        # target is ~2.3× too hot: perfect
                                        # subtraction leaves var 0.43 but the
                                        # loss demands 1.0, so G is pushed to
                                        # under-subtract (measured r4: the
                                        # ch1spec screens' raw β=0) and the
                                        # r2 whiteness gate could never cross
                                        # its 0.99 threshold.
    cnn_noise_frac: float = 1.0 / 8.0
    out_dir: str = "out/bbh"
    ckpt_every: int = 5000
    seed: int = 0
    plots: bool = True
    resume: bool = False
    cnn_cache: str | None = None        # shared CNN-PE checkpoint cache for
                                        # recipe sweeps (the PE phase is
                                        # GAN-recipe independent); keyed by
                                        # every PE-affecting config field
    lalinf_dir: str | None = None       # lalinference products (optional)
    bank_file: str | None = None        # pre-built bank npz (optional)


def effective_n_sig(cfg: BBHConfig, norm: float) -> float:
    """The noise std every residual/whiteness/likelihood target should use.

    In normalized units the event noise sits at std = norm (make_event draws
    unit whitened noise, then the whole series is scaled by
    norm = 1/std(measured)) — truth-free, since std(measured) is observed.
    Shared by run_bbh and the offline postproc/rescue scripts so they score
    with the same likelihood width the run trained with.

    Note (ADVICE r4): configs persisted before the n_sig_event field
    existed (r2/r3 artifacts) default to True here, so offline re-scoring
    of those runs uses the CORRECTED norm-width likelihood, not the
    n_sig=1.0 width they trained with. This is deliberate — the r4 audit
    showed the old width was ~1.5× too hot, so historical clouds are
    re-scored against the physically correct likelihood; cross-round score
    comparisons should use re-scored numbers on both sides."""
    return float(norm) if getattr(cfg, "n_sig_event", True) else cfg.n_sig


def gan_real_bank(cfg: BBHConfig, bank, signal, mesh=None):
    """Real-set bank for the GAN phase (see ``BBHConfig.twin_boost``).

    With ``twin_boost > 0`` the event-twin waveform re-enters the real
    distribution (``boost`` copies, raising its per-draw probability to
    boost/(training_num+boost)); the CNN PE bank is untouched, so the
    evaluation instrument never trains on the event. Under a DP mesh the
    sharded GAN step splits bank rows over devices, so the boost is
    rounded UP until the total row count divides the mesh (extra twin
    copies only nudge the twin's draw probability)."""
    boost = int(getattr(cfg, "twin_boost", 0) or 0)
    if boost <= 0 or bank is None:
        return bank
    if mesh is not None:
        n_dev = mesh.shape["data"]
        boost += (-(bank.shape[0] + boost)) % n_dev
    twin = jnp.tile(jnp.asarray(signal)[None, :], (boost, 1))
    return jnp.concatenate([bank, twin], axis=0)


def _bbh_bank_cfg(cfg: BBHConfig):
    """Bank geometry derived from the workload's n_pix.

    Templates are the central 1 s crop at fs (``BankConfig.n_out == fs``),
    so ``fs = n_pix`` keeps the bank and the model input lengths consistent.
    n_pix=1024 (the default) is the reference geometry — identical to
    ``BankConfig()`` (ref: bbhMahoGANy.py:123); smaller n_pix is the
    integration-test geometry (VERDICT r4 #8: the full-wiring test does not
    need full-resolution physics)."""
    return tb.BankConfig(fs=int(cfg.n_pix))


def _prepare_bbh_data(cfg: BBHConfig, key, skip_bank: bool = False):
    """Bank + event + (optional) lalinference posterior, all device-resident.

    ``skip_bank=True`` returns bank=targets=None (event/psd/norm only) for
    eval-time callers; the event's k_ev split is unchanged, so ``measured``
    is bit-identical to the training run's (the returned key may differ)."""
    bank_cfg = _bbh_bank_cfg(cfg)
    lalinf_samples = None

    if cfg.lalinf_dir:
        from gennet_tpu.data import lalinf_io

        prod = lalinf_io.load_event_products(cfg.lalinf_dir, fs=bank_cfg.fs,
                                             T_safe=bank_cfg.T_obs * bank_cfg.safe)
        psd = prod["psd"]
        measured = jnp.asarray(prod["measured_whitened"])
        signal = jnp.asarray(prod["signal_whitened"])
        norm = float(prod["norm_constant"])
        lalinf_samples = prod.get("posterior_mc_q")
    else:
        psd = psd_mod.analytic_advligo_psd(bank_cfg.fs, bank_cfg.T_obs * bank_cfg.safe)
        k_ev, key = jax.random.split(key)
        signal, measured, norm = tb.make_event(k_ev, psd, bank_cfg)
        norm = float(norm)

    if skip_bank:
        # eval-only callers (sample-posterior CLI, offline rescue/postproc
        # scripts) need measured/psd/norm but not the 50k training bank;
        # the event's k_ev split above is unchanged, so `measured` is
        # bit-identical to what the training run saw
        bank = targets = None
    elif cfg.bank_file:
        if cfg.bank_file.endswith(".gntb"):
            from gennet_tpu.data.bankstore import BankStore

            with BankStore(cfg.bank_file) as store:
                bank = jnp.asarray(store.templates)
                targets = jnp.asarray(store.params[:, :2])  # (mc, q)
        else:
            data = np.load(cfg.bank_file)
            bank = jnp.asarray(data["templates"])
            targets = jnp.asarray(np.stack([data["mc"], data["q"]], axis=-1))
    else:
        k_bank, key = jax.random.split(key)
        templates, params = tb.make_bank(k_bank, cfg.training_num, psd, bank_cfg, norm)
        # drop the event-twin last template from training, as the reference
        # does when PE'ing the real event (ref: bbhMahoGANy.py:1033-1036)
        bank = jnp.asarray(templates[:-1])
        targets = jnp.asarray(np.stack([params["mc"][:-1], params["q"][:-1]], axis=-1))

    if cfg.lalinf_dir:
        truth = (30.0, 0.79)  # event-paper point values (ref: :1064)
    else:
        # synthetic event: the injected template's actual parameters
        bc = _bbh_bank_cfg(cfg)
        mc_t, _ = priors.chirp_mass_eta(bc.tmpl_m1, bc.tmpl_m2)
        truth = (float(mc_t), bc.tmpl_m2 / bc.tmpl_m1)
    return bank, targets, signal, measured, norm, psd, truth, lalinf_samples, key


def run_bbh(cfg: BBHConfig, mesh=None):
    """Flagship pipeline: CNN PE training then GAN training with posterior
    validation. β is ALWAYS reported: against lalinference products when
    mounted, else against the exact grid posterior of the synthetic event
    (same role as the burst workload's analytic grid, SURVEY.md §4 idiom #1)."""
    if cfg.select_best not in ("", "elbo"):
        raise ValueError(f"select_best={cfg.select_best!r}: must be '' or "
                         "'elbo' (a typo would silently revert to "
                         "last-iteration semantics)")
    if cfg.select_route not in ("", "elbo"):
        raise ValueError(f"select_route={cfg.select_route!r}: must be '' or "
                         "'elbo' (a typo would silently fall back to the "
                         "per-knob calibration chain)")
    if cfg.freeze_on_res > 0 and cfg.freeze_on_white <= 0:
        raise ValueError(
            "freeze_on_res > 0 requires freeze_on_white > 0: the res "
            "criterion is only evaluated inside the whiteness gate, so a "
            "res-only config would silently never freeze")
    if not cfg.pair_d and cfg.res_loss_weight <= 0:
        raise ValueError(
            "pair_d=False requires res_loss_weight > 0: without the pair "
            "channel, the residual-moment route is the only term anchoring "
            "G to the measured event")
    key = jax.random.PRNGKey(cfg.seed)
    os.makedirs(cfg.out_dir, exist_ok=True)
    # persist the exact run config so post-hoc tools (e.g.
    # scripts/bbh_sampler_calibration.py) rebuild the same models/data
    # instead of assuming defaults
    import dataclasses
    import json as _json

    with open(os.path.join(cfg.out_dir, "config.json"), "w") as f:
        _json.dump(dataclasses.asdict(cfg), f, indent=1)
    log = MetricLogger(cfg.out_dir, "bbh")

    bank, targets, signal, measured, norm, psd, truth, lalinf_samples, key = \
        _prepare_bbh_data(cfg, key)
    bank_cfg = _bbh_bank_cfg(cfg)
    # effective noise std for every residual/whiteness/likelihood target:
    # the event noise in normalized units sits at std = norm (truth-free,
    # = 1/std(measured)); see BBHConfig.n_sig_event
    n_sig_eff = effective_n_sig(cfg, norm)
    print(f"effective noise std (residual/whiteness targets): {n_sig_eff:.4f}"
          f" ({'event norm' if cfg.n_sig_event else 'config n_sig'})")

    # ---- reference posterior --------------------------------------------
    # lalinference products when mounted (ref comparison set: 3907 rows,
    # lalinf_post_waveform_maker.py:61); otherwise the exact (mc, q)
    # likelihood grid of the synthetic event — so β is never None
    grid = None
    if lalinf_samples is not None:
        ref_samples = np.asarray(lalinf_samples)
    elif cfg.grid_grain > 0:
        sigma_eff = float(np.std(np.asarray(measured) - np.asarray(signal)))
        Lg, gmc, gq = gp.bbh_grid_posterior(measured, psd, bank_cfg, norm,
                                            sigma_eff, grain=cfg.grid_grain)
        grid = (np.asarray(Lg), gmc, gq)
        ref_samples = gp.sample_grid_posterior(Lg, gmc, gq, 3907, seed=cfg.seed)
    else:
        ref_samples = None

    # ---- CNN PE ---------------------------------------------------------
    pe_cfg = CNNConfig(n_pix=cfg.n_pix, batch_size=cfg.pe_batch_size, lr=cfg.lr,
                       noise_frac=cfg.cnn_noise_frac,
                       ema_decay=cfg.pe_ema_decay,
                       lr_decay_steps=cfg.pe_iters if cfg.pe_lr_decay else 0)
    pe_use_ema = cfg.pe_ema_decay > 0
    from gennet_tpu.models import CombinedPE

    pe_model = CombinedPE() if cfg.comb_pe_model else DualBranchPE()

    # CNN sanity-check set: ideal waveforms synthesized FROM the comparison
    # posterior's own mass rows; the CNN's output cloud on these bounds its
    # best achievable posterior (validation idiom #3, ref:
    # lalinf_post_waveform_maker.py + bbhMahoGANy.py:1226-1231)
    sanity_waveforms = None
    if ref_samples is not None:
        m1s, m2s = priors.mc_q_to_m1m2(
            jnp.asarray(ref_samples[:, 0]), jnp.asarray(ref_samples[:, 1])
        )
        sanity_waveforms = tb.make_templates_from_params(m1s, m2s, psd, bank_cfg, norm)
    pe_state = init_cnn(jax.random.PRNGKey(cfg.seed + 1), pe_model, pe_cfg)
    if cfg.cnn_cache:
        # shared across sweep variants; the tag carries every field that
        # changes what the trained CNN is (incl. the bank via seed/size)
        tag = (f"s{cfg.seed}_i{cfg.pe_iters}_n{cfg.n_pix}_b{cfg.pe_batch_size}"
               f"_lr{cfg.lr:g}_nf{cfg.cnn_noise_frac:g}_tn{cfg.training_num}"
               f"_ema{cfg.pe_ema_decay:g}_lrd{int(cfg.pe_lr_decay)}"
               f"_cmb{int(cfg.comb_pe_model)}")
        pe_ckpt = CheckpointManager(os.path.join(cfg.cnn_cache, tag), max_to_keep=1)
        restored, _ = pe_ckpt.restore(pe_state)
        if restored is not None:
            pe_state = restored
            print("CNN PE restored from cache")
    else:
        pe_ckpt = CheckpointManager(os.path.join(cfg.out_dir, "ckpt_pe"))
        if cfg.resume:
            restored, _ = pe_ckpt.restore(pe_state)
            if restored is not None:
                pe_state = restored
    start = int(pe_state.step)
    pe_chunk = cfg.pe_cadence if (
        cfg.pe_cadence > 1 and cfg.pe_iters % cfg.pe_cadence == 0
        and cfg.ckpt_every % cfg.pe_cadence == 0 and start % cfg.pe_cadence == 0
    ) else 1
    if pe_chunk > 1:
        from gennet_tpu.train.cnn import make_cnn_step_scan

        pe_step = make_cnn_step_scan(pe_model, pe_cfg, pe_chunk, mesh=mesh)
    else:
        pe_step = make_cnn_step(pe_model, pe_cfg, mesh=mesh)

    for i0 in range(start, cfg.pe_iters, pe_chunk):
        key, sub = jax.random.split(key)
        pe_state, m = pe_step(pe_state, bank, targets, sub)
        if pe_chunk > 1:
            m = {k: v[-1] for k, v in m.items()}
        i = i0 + pe_chunk if pe_chunk > 1 else i0
        if i % cfg.pe_cadence == 0 and i > 0:
            log.log(i, m)
            print(log.status_line(i, m, log.steps_per_sec(i)))
            if sanity_waveforms is not None:
                # CNN(ideal posterior waveforms) should reproduce the source
                # posterior (ref: bbhMahoGANy.py:1226-1231)
                sane = np.asarray(cnn_predict(pe_model, pe_state, sanity_waveforms,
                                              use_ema=pe_use_ema))
                if sane[:, 0].var() > 0 and sane[:, 1].var() > 0:
                    b = ov.beta_overlap(sane, ref_samples)
                    log.log(i, {"cnn_sanity_beta": b})
                    print(f"CNN sanity-check beta: {b:.4f}")
            if cfg.plots:
                from gennet_tpu.eval import plots as P

                idx = np.random.default_rng(i).choice(bank.shape[0], 4000, replace=False)
                est = np.asarray(cnn_predict(pe_model, pe_state, bank[idx],
                                              use_ema=pe_use_ema))
                P.plot_pe_accuracy(np.asarray(targets)[idx], est, cfg.out_dir,
                                   f"pe_accuracy{i:05d}.png")
        if i % cfg.ckpt_every == 0 and i > 0:
            pe_ckpt.save(i, pe_state)
    if cfg.pe_iters > start:
        pe_ckpt.save(cfg.pe_iters, pe_state)
    # final CNN accuracy: RMS + mean-|err| per parameter on a held-out draw
    # (the reference's rms/pe_std prints, ref: bbhMahoGANy.py:1188-1198)
    idx = np.random.default_rng(0).choice(bank.shape[0], min(4000, bank.shape[0]), replace=False)
    est = np.asarray(cnn_predict(pe_model, pe_state, bank[idx], use_ema=pe_use_ema))
    tgt = np.asarray(targets)[idx]
    pe_rms = [float(np.mean((tgt[:, k] - est[:, k]) ** 2)) for k in range(2)]
    pe_std = [float(np.mean(np.abs(tgt[:, k] - est[:, k]))) for k in range(2)]
    print(f"Completed CNN PE  RMS: {pe_rms[0]:f},{pe_rms[1]:f}  pe_std: {pe_std[0]:f},{pe_std[1]:f}")

    # CNN-sanity posterior cloud: the best the CNN (and hence the GAN+CNN
    # stack) can achieve on ideal inputs; its β vs the reference cloud is the
    # achievable ceiling (ref: bbhMahoGANy.py:1226-1231)
    sanity_cloud, cnn_sanity_beta = None, None
    if sanity_waveforms is not None:
        sanity_cloud = np.asarray(cnn_predict(pe_model, pe_state, sanity_waveforms,
                                              use_ema=pe_use_ema))
        if sanity_cloud[:, 0].var() > 0 and sanity_cloud[:, 1].var() > 0:
            cnn_sanity_beta = ov.beta_overlap(sanity_cloud, ref_samples)
        else:
            cnn_sanity_beta = 0.0  # untrained/collapsed CNN
        print(f"CNN sanity bound beta: {cnn_sanity_beta:.4f}")

    # ---- GAN -------------------------------------------------------------
    inoise = n_sig_eff if cfg.instance_noise < 0 else cfg.instance_noise
    gan_cfg = GANConfig(n_pix=cfg.n_pix, batch_size=cfg.batch_size,
                        lr=cfg.gan_lr or cfg.lr,
                        chi_loss=cfg.chi_loss, n_sig=n_sig_eff,
                        pair_discriminator=cfg.pair_d,
                        label_smoothing=cfg.label_smoothing, d_instance_noise=inoise,
                        d_lr_scale=cfg.d_lr_scale, d_acc_gate=cfg.d_acc_gate,
                        diversity_weight=cfg.diversity_weight,
                        r1_gamma=cfg.r1_gamma,
                        residual_route=cfg.res_loss_weight > 0,
                        res_loss_weight=cfg.res_loss_weight,
                        res_eval_mode=cfg.res_eval_mode,
                        res_spectral_bands=cfg.res_spectral_bands,
                        g_ema_decay=cfg.g_ema_decay,
                        debug_probes=cfg.debug_probes)
    dt = jnp.bfloat16 if cfg.bf16 else jnp.float32
    G = BBHGenerator(n_out=cfg.n_pix, dtype=dt, conv_impl=cfg.conv_impl,
                     norm=cfg.g_norm)
    D = PairDiscriminator(dtype=dt, conv_impl=cfg.conv_impl)
    gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 2), G, D, gan_cfg)
    gan_ckpt = CheckpointManager(os.path.join(cfg.out_dir, "ckpt_gan"))
    if cfg.resume:
        restored, _ = gan_ckpt.restore(gan_state)
        if restored is not None:
            gan_state = restored
    start = int(gan_state.step)
    chunk = cfg.cadence if (
        cfg.cadence > 1 and cfg.gan_iters % cfg.cadence == 0
        and cfg.eval_cadence % cfg.cadence == 0
        and cfg.ckpt_every % cfg.cadence == 0 and start % cfg.cadence == 0
    ) else 1
    if chunk > 1:
        from gennet_tpu.train.gan import make_gan_step_scan

        gan_step_fn = make_gan_step_scan(G, D, gan_cfg, chunk, mesh=mesh)
    else:
        gan_step_fn = make_gan_step(G, D, gan_cfg, mesh=mesh)

    from collections import deque

    from gennet_tpu.eval.whiteness import posterior_whiteness

    snapshots = deque(maxlen=max(1, cfg.n_snapshots))

    def synth(sm):
        # clip to the region where the PhenomD fits are sane (the
        # hunt_constrain prior is mc 20-35, q >= 0.5; far-corner values
        # like mc~1/q~0.05 NaN the fits, and the ML refinement's Adam can
        # wander there)
        sm = jnp.asarray(sm)
        mc = jnp.clip(sm[:, 0], 5.0, 60.0)
        q = jnp.clip(sm[:, 1], 0.2, 1.0)
        m1s, m2s = priors.mc_q_to_m1m2(mc, q)
        return tb.make_templates_from_params(m1s, m2s, psd, bank_cfg, norm)

    def draw_posterior(states, key):
        per = cfg.n_posterior if len(states) == 1 else max(cfg.n_posterior // len(states), 256)
        if cfg.posterior_drate >= 0.0:
            G_samp = BBHGenerator(n_out=cfg.n_pix, dtype=dt,
                                  conv_impl=cfg.conv_impl, norm=cfg.g_norm,
                                  drate=cfg.posterior_drate)
            samp_dropout = True
        else:
            G_samp, samp_dropout = G, cfg.posterior_dropout
        parts = []
        for snap in states:
            key, sub = jax.random.split(key)
            parts.append(sample_generator(G_samp, snap, sub, per, gan_cfg,
                                          dropout=samp_dropout,
                                          temp=cfg.posterior_temp,
                                          bn_mode=cfg.posterior_bn_mode))
        wf = jnp.concatenate(parts, axis=0)
        wf_in = wf
        if cfg.posterior_noise > 0:
            # parametric bootstrap through the noise-augmented CNN (its
            # training already covers N(0, U(0,5)) inputs, ref :1160-1161)
            key, kn = jax.random.split(key)
            wf_in = wf + cfg.posterior_noise * n_sig_eff * jax.random.normal(
                kn, wf.shape, wf.dtype)
        samples = np.asarray(cnn_predict(pe_model, pe_state, wf_in,
                                         use_ema=pe_use_ema))
        samples_raw = samples
        route_elbo = None  # select_route's score for the returned cloud
        if cfg.select_route == "elbo":
            from gennet_tpu.eval import posterior_post as pp

            cnn = lambda w: cnn_predict(pe_model, pe_state, w,
                                        use_ema=pe_use_ema)
            key, ks = jax.random.split(key)
            route, samples, scores = pp.select_route(
                samples, synth, cnn, measured, n_sig_eff, ks,
                temper=(cfg.reweight_temper if cfg.reweight_temper > 0
                        else 1.0))
            route_elbo = scores[route]
            print(f"auto route: {route} (ELBO {route_elbo:.1f})")
        elif (cfg.pe_debias > 0 or cfg.pe_bootcal > 0 or cfg.pe_mlrc > 0
                or cfg.reweight_temper > 0):
            from gennet_tpu.eval import posterior_post as pp

            cnn = lambda w: cnn_predict(pe_model, pe_state, w, use_ema=pe_use_ema)
            if cfg.pe_debias > 0:
                key, kd = jax.random.split(key)
                samples = pp.self_calibrate(samples, synth, cnn, kd,
                                            n_sig_eff, rounds=cfg.pe_debias)
            if cfg.pe_bootcal > 0:
                key, kb = jax.random.split(key)
                samples = pp.bootstrap_calibrate(samples, synth, cnn, kb,
                                                 n_sig_eff)
            if cfg.pe_mlrc > 0:
                key, km = jax.random.split(key)
                samples = pp.ml_recenter(samples, synth, measured, km)
            if cfg.reweight_temper > 0:
                key, kr = jax.random.split(key)
                ess = pp.effective_sample_size(samples, synth, measured,
                                               n_sig_eff, cfg.reweight_temper)
                samples = pp.likelihood_resample(samples, synth, measured,
                                                 n_sig_eff, kr,
                                                 temper=cfg.reweight_temper)
                print(f"likelihood resample ESS: {ess:.1f}/{len(samples)}")
        return wf, samples, samples_raw, route_elbo

    def eval_posterior(states, key, step, tag=None, cloud_override=None):
        """Expensive eval path: posterior draw → CNN → β/grid/whiteness.

        ``cloud_override``: score THIS sample cloud instead of a fresh draw
        (the library-selected final product); its waveforms are synthesized
        from the parameters since pooled clouds have no single G state.
        """
        if cloud_override is not None:
            samples = samples_raw = np.asarray(cloud_override)
            wf = jnp.asarray(np.asarray(synth(samples[:256]), np.float32))
            route_elbo = None
        else:
            wf, samples, samples_raw, route_elbo = draw_posterior(states, key)
        raw_row = {}
        if samples_raw is not samples and ref_samples is not None:
            # post-processing active: keep the untransformed cloud's score
            # in the log so the raw-vs-calibrated gap stays measured
            if samples_raw[:, 0].var() > 0:
                raw_row = {"beta_raw": ov.beta_overlap(samples_raw, ref_samples)}
                if grid is not None:
                    raw_row["grid_overlap_raw"] = gp.grid_overlap_score(
                        samples_raw, grid[0], grid[1], grid[2])
                log.log(step, raw_row)
        save_posterior_snapshot(os.path.join(cfg.out_dir, "GAN_posterior_samples"),
                                step + 1 if tag == "final" else step, samples)
        # audited r5 (VERDICT #4): score the posterior-MEAN waveform's
        # residual; per-draw residuals are inflated by the cloud's own
        # dispersion (the r4 flagship's whiteness 0.087-vs-res_loss-9e-4
        # contradiction), see eval/whiteness.posterior_whiteness
        ws = posterior_whiteness(measured, wf[:256], n_sig_eff)
        w_score = (ws["mean_pass"] + ws["var_pass"] + ws["ljung_box_pass"]) / 3.0
        out = {"whiteness": w_score, "ws": ws, "wf": wf, "samples": samples,
               "beta": None, "grid_overlap": None, **raw_row}
        if grid is not None:
            # cloud diagnostics vs the exact grid (same fields as the burst
            # workload: bias in exact-σ units, dispersion ratio)
            gm = gp.grid_moments(grid[0], grid[1], grid[2])
            log.log(step, {
                "bias_mc": (float(samples[:, 0].mean()) - gm[0]) / max(gm[2], 1e-12),
                "bias_q": (float(samples[:, 1].mean()) - gm[1]) / max(gm[3], 1e-12),
                "disp_mc": float(samples[:, 0].std()) / max(gm[2], 1e-12),
                "disp_q": float(samples[:, 1].std()) / max(gm[3], 1e-12),
            })
        if ref_samples is not None:
            if samples[:, 0].var() > 0 and samples[:, 1].var() > 0:
                out["beta"] = ov.beta_overlap(samples, ref_samples)
                if sanity_cloud is not None:
                    # β vs the CNN-sanity cloud (the reference-posterior
                    # proxy the VERDICT names): GAN and reference clouds
                    # pass through the SAME estimator, so CNN biases cancel
                    out["beta_sanity"] = ov.beta_overlap(samples, sanity_cloud)
                if grid is not None:
                    out["grid_overlap"] = gp.grid_overlap_score(samples, grid[0], grid[1], grid[2])
            else:
                # degenerate cloud (ref guard: bbhMahoGANy.py:1354-1355):
                # a collapsed posterior has zero overlap by definition
                out["beta"] = 0.0
                out["grid_overlap"] = 0.0 if grid is not None else None
        if (cfg.select_best == "elbo" and samples[:, 0].var() > 0
                and samples[:, 1].var() > 0):
            # inside the degeneracy guard: a collapsed cloud must never be
            # selectable; non-finite scores stay out of the jsonl log.
            # Reuse select_route's score when it ranked this exact cloud.
            from gennet_tpu.eval import posterior_post as pp

            elbo = route_elbo if route_elbo is not None else \
                pp.elbo_score(samples, synth, measured, n_sig_eff)
            print(f"cloud ELBO: {elbo:.1f}")
            if np.isfinite(elbo):
                out["elbo"] = elbo
        row = {k: out[k] for k in ("whiteness", "beta", "beta_sanity",
                                   "grid_overlap", "elbo")
               if out.get(k) is not None}
        log.log(step, row if tag is None else {f"{k}_{tag}": v for k, v in row.items()})
        return out

    from gennet_tpu.train.gan import knobs_from_cfg

    base_knobs = knobs_from_cfg(gan_cfg)
    anneal_knobs = base_knobs.replace(
        d_acc_gate=jnp.asarray(-1.0, jnp.float32),
        adv_weight=jnp.asarray(0.0, jnp.float32))
    anneal_start = int(cfg.gan_iters * (1.0 - cfg.anneal_frac))

    gan_bank = gan_real_bank(cfg, bank, signal, mesh=mesh)
    beta_hist, beta_steps = [], []
    best_white, best_state = -1.0, gan_state
    sel_score, sel_states, sel_step = float("-inf"), None, None
    frozen_at = None
    log.steps_per_sec(start)  # reset the steps/sec window for the GAN phase
    # deferred metric flush: the host logs chunk k−1 (one batched transfer +
    # jsonl + stdout) while the device runs chunk k, instead of blocking the
    # dispatch pipeline at every cadence (measured r5 flagship: 94 steps/s
    # in-run vs 211 pure-loop — the gap was exactly this serialized host
    # work). Sync points (eval cadence, end of loop) flush first, so the
    # freeze gate still reads a current res_raw.
    pending = None  # (step, device-side metric dict) awaiting flush
    res_raw = float("inf")

    def flush_metrics():
        nonlocal pending, res_raw
        if pending is None:
            return
        i_p, m_p = pending
        pending = None
        mh = fetch_metrics(m_p)
        res_raw = mh["res_loss"] / max(cfg.res_loss_weight, 1e-30)
        if i_p % cfg.cadence == 0 and i_p > 0:
            # cheap jitted metrics: ALWAYS logged, full-run observability
            log.log(i_p, mh)
            print(log.status_line(i_p, mh, log.steps_per_sec(i_p)))

    for i0 in range(start, cfg.gan_iters, chunk):
        key, sub = jax.random.split(key)
        knobs = anneal_knobs if (cfg.anneal_frac > 0 and i0 >= anneal_start) else base_knobs
        gan_state, m = gan_step_fn(gan_state, gan_bank, measured, sub, knobs)
        if chunk > 1:
            m = {k: v[-1] for k, v in m.items()}
        i = i0 + chunk if chunk > 1 else i0
        flush_metrics()          # previous chunk: overlaps this chunk's compute
        pending = (i, m)
        if i % cfg.eval_cadence == 0 and i > 0:
            flush_metrics()      # sync path anyway; gate needs fresh res_raw
            snapshots.append(gan_state)
            # posterior draw fully on-device: G samples → CNN (ref: :1330-1343)
            key, sub = jax.random.split(key)
            eval_states = list(snapshots)
            ev = eval_posterior(eval_states, sub, i)
            if ev["whiteness"] > best_white:
                best_white, best_state = ev["whiteness"], gan_state
            if ev.get("elbo", float("-inf")) > sel_score:
                # record the exact state LIST that produced the scored
                # cloud (snapshot pooling included)
                sel_score, sel_states, sel_step = ev["elbo"], eval_states, i
            # combined gate, as measured on the burst campaign (commit
            # c6ca0b5): whiteness alone false-positives on 256 draws, the
            # res loss alone on moment-matched wrong morphology — require
            # both (freeze_on_res ≤ 0 disables the res component)
            res_ok = (cfg.freeze_on_res <= 0
                      or 0.0 < res_raw < cfg.freeze_on_res)
            if (cfg.freeze_on_white > 0 and frozen_at is None
                    and ev["whiteness"] >= cfg.freeze_on_white and res_ok):
                frozen_at = i
                print(f"residuals white ({ev['whiteness']:.3f} ≥ "
                      f"{cfg.freeze_on_white}, raw res_loss {res_raw:.2e}) "
                      f"— training frozen at {i}")
                gan_ckpt.save(i, gan_state)
                break
            if ev["beta"] is not None:
                beta_hist.append(ev["beta"])
                beta_steps.append(i)
                print(f"beta result: {ev['beta']}" +
                      ("" if ev["grid_overlap"] is None
                       else f"  grid overlap: {ev['grid_overlap']:.4f}"))
            if cfg.plots:
                from gennet_tpu.eval import plots as P

                wf_np = np.asarray(ev["wf"])
                P.plot_waveform_est(signal, measured, wf_np, cfg.out_dir, i)
                P.plot_waveform_est(signal, measured, wf_np, cfg.out_dir, i,
                                    zoom=(450, 550))
                P.plot_losses(log.arrays(), cfg.out_dir)
                P.plot_pe_samples(ev["samples"], truth, cfg.out_dir, i,
                                  ref_samples=ref_samples)
                if beta_hist:
                    P.plot_beta_history(beta_hist, beta_steps, cfg.out_dir)
        if i % cfg.ckpt_every == 0 and i > 0:
            gan_ckpt.save(i, gan_state)

    flush_metrics()  # last chunk's metrics (loop may end mid-defer)
    gan_ckpt.save(max(cfg.gan_iters, 1), gan_state)

    # ---- FINAL-state artifacts (the reference uses the last iteration's
    # state, ref: :1241); best-whiteness state persisted as a diagnostic ----
    whiteness = beta_final = grid_overlap_final = beta_sanity_final = None
    beta_raw_final = grid_overlap_raw_final = None
    sel_route_name = None
    sel_info = None
    if cfg.gan_iters > start:
        key, sub = jax.random.split(key)
        final_states = [gan_state] if cfg.n_snapshots <= 1 else \
            (list(snapshots) + ([] if snapshots and snapshots[-1] is gan_state else [gan_state]))
        cloud_override = None
        if cfg.select_best == "elbo":
            # candidate-library selection (posterior_post.select_final_cloud,
            # same rule as the burst workload): the trained-final cloud
            # competes against the saved per-eval clouds, their ELBO-plateau
            # pool (measured r5: single-snapshot argmax has no resolution
            # inside the plateau — β 0.8975 vs 0.9563 for the K=20 pool),
            # and smoothed likelihood resamples — all truth-free.
            import glob as _glob

            from gennet_tpu.eval import posterior_post as pp

            key, kdraw, ksel = jax.random.split(key, 3)
            _, samples_f, _, _ = draw_posterior(final_states, kdraw)
            lib = {}
            for p in _glob.glob(os.path.join(
                    cfg.out_dir, "GAN_posterior_samples",
                    "posterior_samples_*.npz")):
                st = int(p.rsplit("_", 1)[1].split(".")[0])
                if st <= cfg.gan_iters:  # skip a previous run's final (+1)
                    lib[st] = np.load(p)["samples"]
            sel_route_name, chosen, sel_info = pp.select_final_cloud(
                lib, synth, measured, n_sig_eff, ksel,
                extra={"final": np.asarray(samples_f)},
                # search-window prior = the exact grid's parameter box
                # (bbh_grid_posterior defaults / the hunt_constrain prior)
                bounds=((20.0, 35.0), (0.5, 1.0)))
            if sel_info:
                print(f"library-selected posterior: {sel_route_name} "
                      f"(scores {{"
                      + ", ".join(f"{k}: {v:.1f}"
                                  for k, v in sel_info["scores"].items())
                      + f"}}, plateau K={len(sel_info.get('plateau_members', []))}, "
                      f"pool ESS {sel_info.get('pool_ess', 0.0):.0f})")
            if chosen is not None:
                cloud_override = np.asarray(chosen)
        ev = eval_posterior(final_states, sub, cfg.gan_iters, tag="final",
                            cloud_override=cloud_override)
        whiteness, beta_final = ev["ws"], ev["beta"]
        grid_overlap_final = ev["grid_overlap"]
        beta_sanity_final = ev.get("beta_sanity")
        beta_raw_final = ev.get("beta_raw")
        grid_overlap_raw_final = ev.get("grid_overlap_raw")
        print(f"final-state residual whiteness: {whiteness}")
        if beta_final is not None:
            print(f"final-state beta: {beta_final:.4f}" +
                  ("" if beta_sanity_final is None
                   else f"  beta vs sanity cloud: {beta_sanity_final:.4f}") +
                  ("" if grid_overlap_final is None
                   else f"  grid overlap: {grid_overlap_final:.4f}"))
        if cfg.plots:
            from gennet_tpu.eval import plots as P

            P.plot_waveform_est(signal, measured, np.asarray(ev["wf"]), cfg.out_dir,
                                cfg.gan_iters, fname="waveform_final.png")
            P.plot_pe_samples(ev["samples"], truth, cfg.out_dir, cfg.gan_iters,
                              ref_samples=ref_samples, fname="pe_samples_final.png")
        if best_white >= 0:
            gan_ckpt.save(cfg.gan_iters + 1, best_state)  # diagnostic state

    log.close()
    return {
        "beta": beta_final,
        "beta_raw": beta_raw_final,
        "grid_overlap_raw": grid_overlap_raw_final,
        "beta_sanity": beta_sanity_final,
        "beta_hist_last": beta_hist[-1] if beta_hist else None,
        "grid_overlap": grid_overlap_final,
        "cnn_sanity_beta": cnn_sanity_beta,
        "final_step": int(gan_state.step),
        "frozen_at": frozen_at,
        "selected_at": sel_step,               # in-run ELBO argmax (diagnostic)
        "selected_route": sel_route_name,      # library candidate chosen
        "pool_ess": (sel_info or {}).get("pool_ess"),
        "plateau_k": len((sel_info or {}).get("plateau_members", [])) or None,
        "whiteness": whiteness,
        "pe_rms": pe_rms,
        "pe_std": pe_std,
    }
