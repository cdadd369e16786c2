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


def smoothed_resample(samples: np.ndarray, synth_fn, measured,
                      n_sig: float, key: jax.Array, temper: float = 1.0,
                      n_out: int | None = None) -> np.ndarray:
    """Weighted kernel resampling: :func:`likelihood_resample` + a Gaussian
    kernel jitter sized by Scott's rule on the WEIGHTED covariance.

    Plain systematic resampling concentrates on the proposal's discrete
    points — measured on the burst pool (84k pooled draws, ESS 4.5k) the
    resampled cloud collapses to std 2.4e-4 in t0, far below the exact
    posterior's in-cell width 1.5e-3, and scores grid overlap 0.77. The
    smoothed bootstrap draws from the weighted KDE instead of the weighted
    empirical measure, which is the standard fix (resampled point + N(0,
    h²Σ̂_w) with h = n_eff^(−1/(p+4))), and restores continuous support.
    Truth-free: uses only the measured data and the forward model.
    """
    s = jnp.asarray(samples)
    n, p = s.shape
    wf = synth_fn(s)
    d = jnp.asarray(measured)[None, :]
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1) / (n_sig**2)
    logl = jnp.where(jnp.isfinite(logl), logl, -jnp.inf)
    if not bool(jnp.any(jnp.isfinite(logl))):
        return np.asarray(samples)
    logw = temper * (logl - jnp.max(logl))
    w = jnp.exp(logw)
    w = w / jnp.sum(w)
    n_out = int(n_out or n)
    ess = float(1.0 / jnp.sum(w**2))
    # weighted moments → kernel bandwidth (Scott, with ESS as the sample
    # size: the kernel must widen when few points carry the weight)
    mu = jnp.sum(w[:, None] * s, axis=0)
    c = s - mu[None, :]
    cov_w = (c * w[:, None]).T @ c / jnp.maximum(1.0 - jnp.sum(w**2), 1e-12)
    cov_w = cov_w + 1e-24 * jnp.eye(p)
    h = max(ess, 2.0) ** (-1.0 / (p + 4))
    kr, kj = jax.random.split(key)
    u0 = jax.random.uniform(kr, ())
    pts = (u0 + jnp.arange(n_out)) / n_out
    idx = jnp.clip(jnp.searchsorted(jnp.cumsum(w), pts), 0, n - 1)
    chol = jnp.linalg.cholesky(cov_w)
    jit = (h * jax.random.normal(kj, (n_out, p), dtype=chol.dtype)) @ chol.T
    return np.asarray(s[idx] + jit)


def kde_is_resample(pool: np.ndarray, synth_fn, measured, n_sig: float,
                    key: jax.Array, bounds=None, n_draw: int = 16384,
                    n_out: int = 4000):
    """Exact importance sampling with the pool's Gaussian KDE as proposal.

    :func:`smoothed_resample` jitters AFTER weighting, so it can only put
    mass where the discrete proposal has points — measured on the burst
    pools (r5), coverage holes in τ cap its grid overlap at 0.71–0.79 even
    with healthy ESS. Here the proposal is the KDE itself: draw θ ~ q̃ =
    (1/n)Σ N(θ_i, H) (Scott bandwidth), weight w = 1[bounds]·L(θ)/q̃(θ) —
    both sides computable, so this is unbiased IS onto the exact posterior
    wherever the KDE has support (measured, seed 0: grid overlap 0.9920,
    ELBO −281.3, the best of every candidate; the posterior's τ width is
    reproduced to 3e-6). ``bounds``: ((lo, hi), ...) per parameter — the
    search-window prior; draws outside get zero weight. Truth-free.

    Returns (cloud[n_out, p], ess) — ess of the importance weights is the
    proposal-adequacy diagnostic to report alongside the product.
    """
    pool = np.asarray(pool, np.float64)
    n, p = pool.shape
    cov = np.cov(pool, rowvar=False) * n ** (-2.0 / (p + 2.0))
    cov += 1e-24 * np.eye(p)
    chol = np.linalg.cholesky(cov)
    prec = np.linalg.inv(cov)
    lognorm = -np.log(n) - 0.5 * (p * np.log(2 * np.pi)
                                  + np.log(np.linalg.det(cov)))
    ki, kj, kr = jax.random.split(key, 3)
    idx = np.asarray(jax.random.randint(ki, (n_draw,), 0, n))
    th = pool[idx] + np.asarray(jax.random.normal(kj, (n_draw, p)),
                                np.float64) @ chol.T

    def logq(x, chunk=2048):
        out = []
        for i in range(0, x.shape[0], chunk):
            d = x[i:i + chunk, None, :] - pool[None, :, :]
            m = np.einsum("mnd,de,mne->mn", d, prec, d)
            mmin = m.min(axis=1, keepdims=True)
            out.append(-0.5 * mmin[:, 0] + np.log(
                np.exp(-0.5 * (m - mmin)).sum(axis=1)))
        return lognorm + np.concatenate(out)

    wf = synth_fn(th)
    logl = -0.5 * np.asarray(
        jnp.sum((jnp.asarray(measured)[None, :] - wf) ** 2, axis=1)) \
        / (n_sig ** 2)
    logw = np.where(np.isfinite(logl), logl, -np.inf) - logq(th)
    if bounds is not None:
        for j, (lo, hi) in enumerate(bounds):
            logw = np.where((th[:, j] >= lo) & (th[:, j] <= hi),
                            logw, -np.inf)
    if not np.isfinite(logw).any():
        return pool[:n_out].copy(), 0.0
    logw = logw - logw.max()
    w = np.exp(logw)
    w /= w.sum()
    ess = float(1.0 / np.sum(w ** 2))
    u0 = float(jax.random.uniform(kr, ()))
    pts = (u0 + np.arange(n_out)) / n_out
    ridx = np.clip(np.searchsorted(np.cumsum(w), pts), 0, n_draw - 1)
    return th[ridx], ess


def plateau_pool(clouds: dict, scores: dict, delta: float = 0.1):
    """Pool the clouds whose score sits within ``delta`` of the maximum.

    The r5 flagship measured that the truth-free ELBO's top states form a
    plateau (top-5 within 0.02 nats) inside which single-snapshot argmax has
    no resolution (their β spans 0.80–0.91); pooling the plateau members is
    a mixture over ELBO-equivalent states and scored β 0.9341 (K=5) /
    0.9463 (K=12) / 0.9563 (K=20) vs 0.8975 for the argmax snapshot.
    ``delta`` is an ELBO-scale (nats) width, fixed — not a tuned knob; the
    measured plateau rule is robust across δ ∈ [0.05, 1].

    Returns (pooled_samples, member_keys) — member_keys sorted ascending.
    """
    finite = {k: v for k, v in scores.items()
              if k in clouds and np.isfinite(v)}
    if not finite:
        return None, []
    mx = max(finite.values())
    members = sorted(k for k, v in finite.items() if v >= mx - delta)
    pool = np.concatenate([np.asarray(clouds[k]) for k in members], axis=0)
    return pool, members


def select_final_cloud(clouds: dict, synth_fn, measured, n_sig: float,
                       key: jax.Array, extra: dict | None = None,
                       delta: float = 0.1, n_out: int = 4000,
                       chunk: int = 16384, n_cap: int = 20000,
                       bounds=None):
    """Truth-free FINAL-posterior selection over a candidate library.

    The single-snapshot ELBO argmax has no resolution inside the ELBO
    plateau (r5 flagship: top-5 states within 0.02 nats, β 0.80–0.91), so
    the production selector scores a library of candidate clouds built from
    the run's saved per-eval clouds and lets :func:`elbo_score` pick:

      argmax   the per-cloud ELBO argmax (the r4 selector; baseline)
      plateau  :func:`plateau_pool` members pooled (δ nats of max)
      pool     ALL saved clouds pooled (coverage proposal)
      pool_is  pooled proposal → :func:`smoothed_resample`
      plat_is  plateau pool → :func:`smoothed_resample`
      *extra   caller-supplied candidates (e.g. the trained final state)

    Everything is truth-free: only the measured data and the forward model
    are consulted. Returns ``(name, cloud, info)`` with per-candidate ELBO
    (+ its Monte-Carlo SE), plateau membership, and the pooled proposal's
    ESS in ``info``. Selection = ELBO argmax with one SE-aware tie-break:
    when ``kde_is`` (the unbiased IS product) scores within one combined SE
    of the argmax and its IS ESS ≥ 100, it is preferred (see inline note).
    """
    def synth_chunked(s):
        s = np.asarray(s)
        if s.shape[0] <= chunk:
            return synth_fn(s)
        return jnp.concatenate([synth_fn(s[i:i + chunk])
                                for i in range(0, s.shape[0], chunk)], axis=0)

    live = {k: np.asarray(v) for k, v in clouds.items()
            if np.asarray(v)[:, 0].var() > 0 and np.asarray(v)[:, 1].var() > 0}
    cands = dict(extra or {})
    info = {}
    if live:
        per = {s: elbo_score(c, synth_chunked, measured, n_sig)
               for s, c in live.items()}
        argmax_step = max(per, key=per.get)
        plat, members = plateau_pool(live, per, delta=delta)
        pool = np.concatenate(list(live.values()), axis=0)
        k1, k2, kc = jax.random.split(key, 3)

        def cap(c):
            # bound the returned/scored pooled products: downstream β /
            # grid-overlap KDEs are O(n·grid) in memory, and 20k draws
            # already estimate a 2-D mixture to well below metric noise
            if c.shape[0] <= n_cap:
                return c
            idx = np.asarray(jax.random.choice(
                kc, c.shape[0], (n_cap,), replace=False))
            return c[idx]

        cands["argmax"] = live[argmax_step]
        if plat is not None:
            cands["plateau"] = cap(plat)
            cands["plat_is"] = smoothed_resample(plat, synth_chunked,
                                                 measured, n_sig, k2,
                                                 n_out=n_out)
        cands["pool"] = cap(pool)
        cands["pool_is"] = smoothed_resample(pool, synth_chunked, measured,
                                             n_sig, k1, n_out=n_out)
        key, kk = jax.random.split(key)
        cands["kde_is"], kde_ess = kde_is_resample(
            cands["pool"], synth_chunked, measured, n_sig, kk,
            bounds=bounds, n_out=n_out)
        info.update({
            "argmax_step": argmax_step,
            "plateau_members": members,
            "pool_ess": effective_sample_size(pool, synth_chunked, measured,
                                              n_sig),
            "kde_ess": kde_ess,
        })
    if not cands:
        return None, None, info
    scores, ses = {}, {}
    for name, c in cands.items():
        c = np.asarray(c)
        if c[:, 0].var() <= 0 or c[:, 1].var() <= 0:
            scores[name] = float("-inf")  # collapsed candidate: unselectable
            ses[name] = float("inf")
            continue
        scores[name], ses[name] = elbo_score(c, synth_chunked, measured,
                                             n_sig, return_se=True)
    info["scores"] = scores
    info["score_ses"] = ses
    info["candidates"] = cands  # for offline studies (each ≤ n_cap × p)
    best = max(scores, key=scores.get)
    # SE-aware tie-break (measured r5): the flagship library's top ELBOs sit
    # 0.01 nats apart — far inside the score's own Monte-Carlo noise (SE
    # ~0.02–0.05 at n=4k) — while their truth quality differs materially
    # (argmax β 0.8975 vs kde_is 0.9731). Within one combined SE of the
    # argmax, theory prefers kde_is: it is the only candidate that is an
    # UNBIASED importance-sampling estimate of the exact posterior (given
    # healthy IS ESS); every other candidate is a variational proposal. The
    # preference is a priori and was already the outright ELBO winner on all
    # three held-out burst seeds (pool_study: chosen kde_is, overlap ≥0.994).
    kde_ess = info.get("kde_ess", 0.0)
    if (best != "kde_is" and "kde_is" in scores
            and np.isfinite(scores["kde_is"]) and kde_ess >= 100.0):
        tol = np.sqrt(ses[best] ** 2 + ses["kde_is"] ** 2)
        if np.isfinite(tol) and scores["kde_is"] >= scores[best] - tol:
            info["tiebreak"] = {"over": best, "tol": float(tol),
                                "gap": float(scores[best] - scores["kde_is"])}
            best = "kde_is"
    return best, np.asarray(cands[best]), info


def elbo_score(samples: np.ndarray, synth_fn, measured, n_sig: float,
               entropy: str = "gauss", return_se: bool = False):
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

    ``return_se=True`` additionally returns the Monte-Carlo standard error
    of the E_q[logL] term (std(logL)/√n) — the dominant estimator noise of
    the score. Measured need (r5 flagship): the library candidates' ELBOs
    sat 0.01 nats apart while their β spanned 0.8975–0.9731; a selection
    rule that compares scores without their SE treats that gap as signal.
    """
    s = jnp.asarray(samples)
    n, p = s.shape
    wf = synth_fn(s)
    d = jnp.asarray(measured)[None, :]
    logl = -0.5 * jnp.sum((d - wf) ** 2, axis=1) / (n_sig**2)
    finite = jnp.isfinite(logl)
    if not bool(jnp.any(finite)):
        return (float("-inf"), float("inf")) if return_se else float("-inf")
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
    if not np.isfinite(out):
        out = float("-inf")
    if return_se:
        logl_f = jnp.where(finite, logl, floor)
        se = float(jnp.std(logl_f) / jnp.sqrt(n))
        return out, (se if np.isfinite(out) else float("inf"))
    return out


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
