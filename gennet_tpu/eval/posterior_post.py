"""Truth-free posterior post-processing for point-estimator clouds.

The mahoGANy posterior is CNN(G draws) (ref: bbhMahoGANy.py:1330-1343).
r2 measured the remaining burst overlap gap to be ESTIMATOR error, not
generator error: the CNN is biased on off-manifold inputs (its τ estimates
on G draws sit low even when the draws correlate 0.98 with the truth).
Both corrections below use only the measured data, the known signal model,
and the CNN itself — no ground truth:

- :func:`self_calibrate`: measure the CNN's own bias at the cloud's
  location by round-tripping templates synthesized AT the estimates
  (+ measurement-scale noise) through the CNN, and subtract the measured
  mean shift. One round fixes a constant local bias; more rounds refine.

- :func:`likelihood_resample`: importance-resample the cloud with weights
  from the residual likelihood of the measured series given the template
  at each estimate, L_i ∝ exp(−½‖d − s(θ_i)‖²/σ²). The GAN+CNN cloud is
  the proposal; the known forward model sharpens it. This is the
  "importance reweighting by the residual likelihood" route — it scales to
  parameter spaces where the exact grid (ref: burstMahoGANy.py:716-726)
  does not, because it only evaluates s(θ) at the proposal points.
"""

import jax
import jax.numpy as jnp
import numpy as np


def self_calibrate(samples: np.ndarray, synth_fn, cnn_fn, key: jax.Array,
                   n_sig: float, rounds: int = 1) -> np.ndarray:
    """Debias a point-estimator cloud by measured round-trip shift.

    samples: (N, P) estimated parameters (the observed cloud y).
    synth_fn: (N, P) → (N, n_pix) noise-free templates at those parameters.
    cnn_fn: (N, n_pix) → (N, P) the estimator itself.

    With bias field b(θ) = E[cnn(s(θ)+noise)] − θ, the observed cloud is
    y ≈ θ + b(θ); solve θ + b(θ) = y by fixed-point iteration ANCHORED at
    the observations: θ_{k+1} = y − b̄(θ_k), where b̄ is the mean round-trip
    shift measured at the current iterate (a constant-bias correction at
    the cloud's location; one round suffices for constant b, more rounds
    refine a slowly-varying field).
    """
    y = jnp.asarray(samples)
    s = y
    for _ in range(max(rounds, 0)):
        key, kn = jax.random.split(key)
        wf = synth_fn(s)
        wf = wf + n_sig * jax.random.normal(kn, wf.shape, wf.dtype)
        rt = jnp.asarray(cnn_fn(wf))
        delta = jnp.mean(rt - s, axis=0)
        s = y - delta[None, :]
    return np.asarray(s)


def bootstrap_calibrate(samples: np.ndarray, synth_fn, cnn_fn, key: jax.Array,
                        n_sig: float, shrink: bool = True) -> np.ndarray:
    """Debias AND dispersion-match a cloud to its parametric bootstrap.

    The bootstrap cloud r = cnn(s(θ̄) + noise_i) — the estimator's own
    sampling distribution if the cloud's center θ̄ were the truth — is the
    same construction as the CNN-sanity ceiling (ref idiom:
    bbhMahoGANy.py:1226-1231), made truth-free by anchoring at the cloud's
    location instead of the true parameters. Two measured corrections:

    - bias: δ = mean(r) − θ̄ is the estimator's bias at this location;
      subtract it from every sample (same shift :func:`self_calibrate`
      measures, at the center instead of per-sample).
    - width: the noise-limited posterior width through this estimator IS
      std(r); when the observed cloud is wider (measured r2 failure mode:
      MC-dropout draws centered but 3–4.6× over-dispersed), shrink it about
      its mean by the per-parameter ratio. Only shrink — an under-dispersed
      cloud is the upstream sampler's job (``posterior_noise`` bootstrap).
    """
    y = jnp.asarray(samples)
    center = jnp.mean(y, axis=0)
    wf = synth_fn(center[None, :])
    wf = jnp.broadcast_to(wf, (y.shape[0],) + wf.shape[1:])
    wf = wf + n_sig * jax.random.normal(key, wf.shape, wf.dtype)
    r = jnp.asarray(cnn_fn(wf))
    delta = jnp.mean(r, axis=0) - center
    ratio = jnp.std(y, axis=0) / jnp.maximum(jnp.std(r, axis=0), 1e-12)
    scale = 1.0 / jnp.maximum(ratio, 1.0) if shrink else 1.0
    out = (center - delta)[None, :] + (y - center[None, :]) * scale
    return np.asarray(out)


def ml_recenter(samples: np.ndarray, synth_fn, measured, key: jax.Array,
                steps: int = 300, n_starts: int = 8,
                lr: float = 0.1) -> np.ndarray:
    """Shift a cloud so its center sits at the maximum-likelihood point.

    The burst seed-1 diagnosis (scripts/burst_debias_diag.py) measured the
    failure the round-trip routes cannot see: the CNN's bias lives on
    OFF-manifold G draws, so round-tripping clean templates through it
    (:func:`self_calibrate` / :func:`bootstrap_calibrate`) measures ~zero
    shift, and :func:`likelihood_resample` delta-collapses when no draw
    lands in the (ultra-sharp) posterior's support. This route instead
    anchors the cloud to the forward model directly: refine
    θ* = argmin ‖d − s(θ)‖² with Adam from the ``n_starts``
    best-likelihood draws (multi-start guards against oscillatory local
    maxima in carrier-phase parameters like the sine-Gaussian t0), then
    translate the whole cloud so its mean is θ*. Dispersion is untouched —
    in a likelihood-dominated (high-SNR) posterior θ* ≈ the truth, so this
    is the truth-free version of the measured oracle debias (0.88 on the
    seed-1 reconstruction).

    Optimization is scale-free: θ = θ0 + z·σ_cloud with Adam in z-units,
    so one ``lr`` serves parameters of any scale (t0 ~s, τ ~ms, mc ~30).
    """
    import optax

    s = jnp.asarray(samples)
    d = jnp.asarray(measured)[None, :]
    wf = synth_fn(s)
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1)
    k = min(n_starts, s.shape[0])
    sig = jnp.maximum(jnp.std(s, axis=0), 1e-12)
    # half the starts are the best-likelihood draws; the other half are
    # 2σ-jittered around the center so basins the (possibly clustered)
    # draws miss still get a start
    center0 = jnp.mean(s, axis=0)
    jit = center0[None, :] + 2.0 * sig[None, :] * jax.random.normal(
        key, (max(k // 2, 1), s.shape[1]), s.dtype)
    starts = jnp.concatenate([s[jnp.argsort(-logl)[: k - jit.shape[0]]], jit])

    def loss(z):
        # per-start residual power; sum is fine — starts are independent
        return jnp.sum((d - synth_fn(starts + z * sig[None, :])) ** 2)

    opt = optax.adam(lr)
    state0 = opt.init(jnp.zeros_like(starts))

    def step(carry, _):
        z, ostate = carry
        g = jax.grad(loss)(z)
        upd, ostate = opt.update(g, ostate)
        return (optax.apply_updates(z, upd), ostate), None

    (z, _), _ = jax.lax.scan(step, (jnp.zeros_like(starts), state0),
                             None, length=steps)
    # candidate set = refined points ∪ unrefined starts, non-finite losses
    # masked out: Adam can diverge into parameter regions where the forward
    # model is NaN (observed live: a NaN refinement once poisoned a whole
    # eval's cloud) — the unrefined best-likelihood draw is always a finite
    # fallback, making this transform never-worse than the raw cloud
    theta = jnp.concatenate([starts + z * sig[None, :], starts])
    final = jnp.sum((d - synth_fn(theta)) ** 2, axis=1)
    finite_rows = jnp.all(jnp.isfinite(theta), axis=1)
    final = jnp.where(jnp.isfinite(final) & finite_rows, final, jnp.inf)
    best = theta[jnp.argmin(final)]
    shift = best - jnp.mean(s, axis=0)
    # no candidate with a finite loss -> the likelihood saw nothing: no shift
    ok = jnp.isfinite(jnp.min(final)) & jnp.all(jnp.isfinite(shift))
    out = s + jnp.where(ok, shift, 0.0)[None, :]
    return np.asarray(out)


def likelihood_resample(samples: np.ndarray, synth_fn, measured,
                        n_sig: float, key: jax.Array,
                        temper: float = 1.0) -> np.ndarray:
    """Importance-resample a cloud by the residual likelihood of the data.

    Weights w_i ∝ exp(temper · logL_i), logL_i = −½‖d − s(θ_i)‖²/σ².
    ``temper`` < 1 flattens the weights (guards against weight collapse
    when the proposal under-covers); systematic resampling keeps N fixed.
    """
    s = jnp.asarray(samples)
    wf = synth_fn(s)
    d = jnp.asarray(measured)[None, :]
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1) / (n_sig**2)
    logl = jnp.where(jnp.isfinite(logl), logl, -jnp.inf)  # NaN draw = weight 0
    if not bool(jnp.any(jnp.isfinite(logl))):
        return np.asarray(samples)  # nothing to weight by; leave unchanged
    logw = temper * (logl - jnp.max(logl))
    w = jnp.exp(logw)
    w = w / jnp.sum(w)
    # systematic resampling (low-variance, deterministic given one uniform)
    n = s.shape[0]
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(n)) / n
    idx = jnp.searchsorted(jnp.cumsum(w), pts)
    idx = jnp.clip(idx, 0, n - 1)
    return np.asarray(s[idx])


def elbo_score(samples: np.ndarray, synth_fn, measured, n_sig: float,
               entropy: str = "gauss") -> float:
    """Truth-free cloud-quality score: ELBO of the cloud vs the exact posterior.

    For a cloud q and the data-only posterior p(θ|d) ∝ exp(logL(θ)) (flat
    prior over the search window), ELBO(q) = E_q[logL] + H(q) equals
    log Z − KL(q ‖ p): ranking snapshot states by ELBO ranks them by
    closeness to the exact posterior WITHOUT evaluating the posterior on a
    grid — only the forward model at the cloud's own points. This is the
    selection analogue of :func:`likelihood_resample` (same logL, used to
    score a whole cloud instead of reweighting its points). Measured need:
    the burst whiteness score saturates at 1.0 across late snapshots whose
    overlaps still range 0.76–0.93, so whiteness cannot pick between them;
    E_q[logL] alone would reward delta-collapse onto the ML point — the
    entropy term is what penalizes both collapse and over-dispersion.

    entropy='gauss': ½·log det(2πe·Σ̂) — exact for Gaussian clouds, robust
    to the duplicate points systematic resampling produces. 'knn':
    Kozachenko–Leonenko k-NN estimator (nonparametric; duplicates floored).
    Returns −inf when no draw has finite likelihood.
    """
    s = jnp.asarray(samples)
    n, p = s.shape
    wf = synth_fn(s)
    d = jnp.asarray(measured)[None, :]
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1) / (n_sig**2)
    finite = jnp.isfinite(logl)
    if not bool(jnp.any(finite)):
        return float("-inf")
    # non-finite forward-model output = q mass where the likelihood is
    # undefined; charge it the worst finite draw minus a fixed penalty
    floor = jnp.min(jnp.where(finite, logl, jnp.inf)) - 100.0
    mean_logl = jnp.mean(jnp.where(finite, logl, floor))
    if entropy == "knn":
        from scipy.special import digamma, gammaln

        k = min(4, n - 1)
        x = np.asarray(s, np.float64)
        d2 = np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
        np.fill_diagonal(d2, np.inf)
        eps = np.sqrt(np.partition(d2, k - 1, axis=1)[:, k - 1])
        eps = np.maximum(eps, 1e-300)  # duplicate points (resampled clouds)
        log_vp = (p / 2.0) * np.log(np.pi) - gammaln(p / 2.0 + 1.0)
        h = (digamma(n) - digamma(k) + log_vp
             + (p / n) * np.sum(np.log(eps)))
    else:
        cov = jnp.cov(s, rowvar=False) + 1e-24 * jnp.eye(p)
        sign, logdet = jnp.linalg.slogdet(2.0 * jnp.pi * jnp.e * cov)
        h = jnp.where(sign > 0, 0.5 * logdet, -jnp.inf)
    out = float(mean_logl + h)
    return out if np.isfinite(out) else float("-inf")


def select_route(samples: np.ndarray, synth_fn, cnn_fn, measured,
                 n_sig: float, key: jax.Array, temper: float = 1.0,
                 entropy: str = "gauss"):
    """Truth-free automatic calibration-route selection by ELBO.

    Applies the measured route library to the raw cloud — raw, parametric-
    bootstrap calibration, ML recentering, bootcal→mlrc, and (when
    ``temper`` > 0) likelihood resampling of the raw and recentered
    clouds — scores every candidate with :func:`elbo_score`, and returns
    ``(best_name, best_cloud, scores)``. This automates the route choice
    the sweep campaigns made by hand; measured on the r3 screens the ELBO
    argmax coincides with the best-β route in both regimes:

    - flagship (over-dispersed proposal): mlrc→reweight wins β 0.90 AND
      ELBO −226.5 vs −256…−301 for the others;
    - burst delta-collapse (seed 1): resampling collapses the cloud,
      its entropy → −inf, ELBO rejects it, and the recentered cloud wins —
      matching the measured sweep outcome (mlrc 0.86 vs resample 0.0004).
    """
    kb, km, kmb, kr, kmr = jax.random.split(key, 5)
    candidates = {"raw": samples}
    candidates["bootcal"] = bootstrap_calibrate(samples, synth_fn, cnn_fn,
                                                kb, n_sig)
    candidates["mlrc"] = ml_recenter(samples, synth_fn, measured, km)
    candidates["mlrc_bootcal"] = ml_recenter(candidates["bootcal"],
                                             synth_fn, measured, kmb)
    if temper > 0:
        candidates["reweight"] = likelihood_resample(
            samples, synth_fn, measured, n_sig, kr, temper=temper)
        candidates["mlrc_reweight"] = likelihood_resample(
            candidates["mlrc"], synth_fn, measured, n_sig, kmr,
            temper=temper)
    scores = {name: elbo_score(c, synth_fn, measured, n_sig,
                               entropy=entropy)
              for name, c in candidates.items()}
    best = max(scores, key=scores.get)
    return best, np.asarray(candidates[best]), scores


def effective_sample_size(samples: np.ndarray, synth_fn, measured,
                          n_sig: float, temper: float = 1.0) -> float:
    """ESS of the likelihood weights — the proposal-adequacy diagnostic
    (small ESS ⇒ the GAN cloud under-covers the posterior)."""
    s = jnp.asarray(samples)
    wf = synth_fn(s)
    d = jnp.asarray(measured)[None, :]
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1) / (n_sig**2)
    logl = jnp.where(jnp.isfinite(logl), logl, -jnp.inf)
    if not bool(jnp.any(jnp.isfinite(logl))):
        return 0.0
    logw = temper * (logl - jnp.max(logl))
    w = jnp.exp(logw)
    w = w / jnp.sum(w)
    return float(1.0 / jnp.sum(w**2))
