"""Whitened BBH template-bank synthesis — fully on-device, one fused program.

Replaces the reference's serial host pipeline (`sim_data` + `gen_bbh` +
`make_bbh`, ref: gw_template_maker.py:462-740), which makes one lalsimulation
C call, two FFT whitens and a spline interpolation per template inside a
Python while-loop. Here the whole bank is one jitted, vmapped XLA program:

    masses ~ prior → IMRPhenomD (amp, phase) on the safe FD grid
    → whitening gain (amp·=g) → antenna projection & geocentre delay
      (phase+=δ, scalar K) → quadrature iDFT (2 MXU matmuls)
    → envelope-peak alignment to the requested index (gather-roll)
    → aggressive centred Tukey window → central-1s crop → normalization

and shards embarrassingly-parallel over the mesh 'data' axis for multi-chip
generation. No complex dtypes anywhere (the TPU runtime has none): FD series
travel as (amplitude, phase) pairs.

Semantics preserved from the reference:
- safe window: generate at ``safe × T_obs`` then crop the central second
  (ref: :54,695,790-791)
- peak placed uniformly in the β-fraction window of the central region
  (`convert_beta`, ref: :133-159,421-426)
- fixed GW150914 extrinsics (ref: :432-437); `hunt_constrain` mass prior by
  default (ref: :805-806)
- the exact GW150914-like template appended last (ref: :729-739)
- the event-derived normalization constant applied to every template
  (ref: :779-784,813-814)

Quirks *not* copied (SURVEY.md §7.3): the −11-sample calibration offset
(ref: :554) is exposed as ``calibration_offset`` defaulting to 0; the spline
time shift that was computed-then-discarded (ref: :626-630) is an exact FD
phase ramp, actually applied.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gennet_tpu.ops import dft
from gennet_tpu.physics import constants, detector, priors, waveform, whiten, windows


@dataclass(frozen=True)
class BankConfig:
    """Template-bank configuration (reference defaults throughout)."""

    fs: int = 1024                    # sampling rate [Hz] (ref: :123)
    T_obs: int = 2                    # output obs window before safe× [s] (ref: :124)
    safe: int = 2                     # safety multiplier (ref: :54)
    det: str = "H1"                   # detector (ref: :125)
    mdist: str = "hunt_constrain"     # mass prior (ref: :805-806)
    beta: tuple = (0.45, 0.55)        # peak placement fraction (ref: :806)
    f_low: float = constants.DEFAULT_F_LOW
    dist_mpc: float = constants.DEFAULT_DISTANCE_MPC
    ra: float = constants.GW150914_FIXED_EXTRINSIC["ra"]
    dec: float = constants.GW150914_FIXED_EXTRINSIC["dec"]
    iota: float = constants.GW150914_FIXED_EXTRINSIC["iota"]
    phi: float = constants.GW150914_FIXED_EXTRINSIC["phi"]
    psi: float = constants.GW150914_FIXED_EXTRINSIC["psi"]
    event_time: float = constants.GW150914_EVENT_TIME
    calibration_offset: int = 0       # the reference used −11 (quirk, ref: :554)
    tmpl_m1: float = constants.GW150914_TEMPLATE_MASSES[0]
    tmpl_m2: float = constants.GW150914_TEMPLATE_MASSES[1]

    @property
    def n_safe(self) -> int:
        return self.fs * self.T_obs * self.safe

    @property
    def n_out(self) -> int:
        return self.fs  # central 1 s crop (ref: :695)

    @property
    def nf(self) -> int:
        return self.n_safe // 2 + 1

    @property
    def nf_pad(self) -> int:
        """Frequency bins padded to a lane multiple for the Pallas kernel;
        padded bins carry amp == 0 (band-limited above Nyquist) so they
        contribute exactly nothing."""
        return ((self.nf + 127) // 128) * 128

    def freqs(self, padded: bool = False) -> np.ndarray:
        n = self.nf_pad if padded else self.nf
        return np.arange(n) / (self.T_obs * self.safe)

    def beta_index_bounds(self) -> tuple:
        """convert_beta (ref: gw_template_maker.py:133-159): β fractions of
        the central window → absolute sample indices in the safe window."""
        T_safe = self.T_obs * self.safe
        lo = (self.beta[0] + 0.5 * self.safe - 0.5) / self.safe
        hi = (self.beta[1] + 0.5 * self.safe - 0.5) / self.safe
        return int(T_safe * self.fs * lo), int(T_safe * self.fs * hi)


from functools import lru_cache


def _antenna_projection(cfg: BankConfig):
    """Static per-config scalars: the effective amplitude K and phase offset
    δ of h_det = Fp·h+ + Fc·h× for fixed extrinsics, plus the geocentre time
    delay. h̃_det = K · A e^{−i(Ψ + δ)} since h̃× = h̃+ e^{−iπ/2}·(2c/(1+c²)).

    Evaluated host-side in float64 (constant-folded into the bank program).
    Cached on the exact scalar inputs, not the config object, so a future
    non-hashable config field cannot silently break the cache."""
    return _antenna_projection_cached(cfg.event_time, cfg.ra, cfg.dec,
                                      cfg.psi, cfg.det, cfg.iota)


@lru_cache(maxsize=16)
def _antenna_projection_cached(event_time, ra, dec, psi, det, iota):
    fp, fc = detector.antenna_response(event_time, ra, dec, psi, det)
    tdelay = float(
        detector.time_delay_from_earth_center(event_time, ra, dec, det)
    )
    fp, fc = float(fp), float(fc)
    cosi = np.cos(iota)
    a_p = 0.5 * (1 + cosi**2) * fp
    a_c = cosi * fc
    K = float(np.hypot(a_p, a_c))
    delta = float(np.arctan2(a_c, a_p))
    return K, delta, tdelay, a_p, a_c


@partial(jax.jit, static_argnames=("cfg", "n"))
def make_template_batch(key: jax.Array, n: int, psd: jnp.ndarray, cfg: BankConfig = BankConfig(),
                        norm_constant: float = 1.0):
    """Generate ``n`` whitened, peak-placed, cropped templates.

    Returns ``(templates, params)``: templates (n, fs) float32, params a dict
    of per-template m1, m2, mc, q, eta, M, idx (peak index in the safe
    window, as the reference records, ref: bbhparams.idx).
    """
    k_mass, k_idx = jax.random.split(key)
    masses = priors.sample_masses(k_mass, n, mdist=cfg.mdist)
    lo, hi = cfg.beta_index_bounds()
    idx = jax.random.randint(k_idx, (n,), lo, jnp.maximum(hi, lo + 1))
    t_work = _synthesize(masses["m1"], masses["m2"], idx, psd, cfg) * norm_constant
    params = dict(masses)
    params.pop("valid")
    params["q"] = masses["m2"] / masses["m1"]
    params["idx"] = idx
    return t_work, params


@partial(jax.jit, static_argnames=("cfg", "n", "n_noise", "time_grid"))
def make_noisy_template_batch(key: jax.Array, n: int, psd: jnp.ndarray,
                              cfg: BankConfig = BankConfig(), norm_constant: float = 1.0,
                              n_noise: int = 1, time_grid: int = 1):
    """Bank variant with per-template noise realizations and/or a grid of
    merger-time realizations per mass sample.

    Mirrors the reference's ``Nnoise`` semantics (ref: sim_data,
    gw_template_maker.py:685-692): ``n_noise=0`` is a CLEAN bank (one copy
    per mass draw, no noise added), ``n_noise>=1`` stacks that many noise
    realizations — whiten(signal + colored noise), which in the whitened
    domain is exactly template + N(0,1). ``time_grid`` mirrors the
    ``do_time_grid`` option (ref: :57,702-715 — ``N_time_grid`` random peak
    placements per mass draw).

    Returns (templates [(n·time_grid·max(n_noise,1)), fs], params).
    """
    k_mass, k_idx, k_noise = jax.random.split(key, 3)
    masses = priors.sample_masses(k_mass, n, mdist=cfg.mdist)
    m1 = jnp.repeat(masses["m1"], time_grid)
    m2 = jnp.repeat(masses["m2"], time_grid)
    lo, hi = cfg.beta_index_bounds()
    idx = jax.random.randint(k_idx, (n * time_grid,), lo, jnp.maximum(hi, lo + 1))
    clean = _synthesize(m1, m2, idx, psd, cfg) * norm_constant

    n_rep = max(n_noise, 1)
    reps = jnp.tile(clean, (n_rep, 1))
    if n_noise >= 1:
        noise = jax.random.normal(k_noise, reps.shape, reps.dtype)
        noisy = reps + noise
    else:
        noisy = reps
    params = {
        "m1": jnp.tile(m1, (n_rep,)), "m2": jnp.tile(m2, (n_rep,)),
        "mc": jnp.tile(jnp.repeat(masses["mc"], time_grid), (n_rep,)),
        "q": jnp.tile(jnp.repeat(masses["m2"] / masses["m1"], time_grid), (n_rep,)),
        "idx": jnp.tile(idx, (n_rep,)),
    }
    return noisy, params


@partial(jax.jit, static_argnames=("cfg",))
def make_templates_from_params(m1: jnp.ndarray, m2: jnp.ndarray, psd: jnp.ndarray,
                               cfg: BankConfig = BankConfig(), norm_constant: float = 1.0,
                               idx: jnp.ndarray | None = None):
    """Synthesize waveforms for GIVEN mass rows — the reference's
    lalinf-posterior waveform maker (ref: lalinf_post_waveform_maker.py:
    masses from posterior rows, :385-405,719-721), producing the
    "CNN sanity check" set: feeding these ideal inputs to the CNN should
    reproduce the source posterior (validation idiom #3, SURVEY.md §4).

    Peaks default to the centre of the safe window.
    """
    if idx is None:
        idx = jnp.full(m1.shape, cfg.n_safe // 2, jnp.int32)
    return _synthesize(jnp.asarray(m1), jnp.asarray(m2), idx, psd, cfg) * norm_constant


@partial(jax.jit, static_argnames=("cfg",))
def make_event_template(psd: jnp.ndarray, cfg: BankConfig = BankConfig()):
    """The GW150914-like template: fixed masses (36, 29), peak at the centre
    of the safe window (β = [0.5, 0.5]) (ref: gen_par gw_tmp branch,
    gw_template_maker.py:446-458)."""
    m1 = jnp.asarray([cfg.tmpl_m1])
    m2 = jnp.asarray([cfg.tmpl_m2])
    centre = jnp.asarray([cfg.n_safe // 2], jnp.int32)
    return _synthesize(m1, m2, centre, psd, cfg)[0]


# envelope-peak search half-width around t=0 (samples). The t0 phase
# alignment puts the whitened envelope peak within a few samples of t=0 for
# the entire mass prior (measured: −4…−3); 64 is a wide safety margin.
_PEAK_SEARCH = 64


def _synthesize(m1, m2, idx, psd, cfg: BankConfig):
    """Core fused pipeline: (m1, m2, target idx) → whitened cropped strain.

    Two-pass peak alignment, designed for the TPU memory system: a per-row
    gather-roll is pathologically slow on the vector units, so instead
    pass A localizes the envelope peak with a column-sliced iDFT around t=0,
    and pass B applies the alignment as an exact FD phase ramp and inverse-
    transforms directly onto the windowed central second (window folded into
    the constant iDFT matrix — roll/window/crop all land in one matmul).
    """
    dtype = jnp.float32
    use_pallas = jax.default_backend() == "tpu"
    freqs = jnp.asarray(cfg.freqs(padded=use_pallas), dtype)
    N = cfg.n_safe
    nf = cfg.nf

    # FD waveform per template (vmapped over masses). On the Pallas path the
    # grid is lane-padded past Nyquist; f_high band-limiting zeroes those
    # bins' amplitude, so they are inert through the whole pipeline.
    amp, phase = jax.vmap(
        lambda a, b: waveform.imrphenomd_ampphase(
            freqs, a, b, dist_mpc=cfg.dist_mpc, f_low=cfg.f_low, f_high=cfg.fs / 2
        )
    )(m1.astype(dtype), m2.astype(dtype))

    # whitening is an amplitude gain; antenna projection a scalar amp/phase
    # offset; geocentre delay a phase ramp (ref C calls: :612,616-617)
    K, delta, tdelay, _, _ = _antenna_projection(cfg)
    gain = whiten.whitening_gain(jnp.asarray(psd, dtype), cfg.fs)
    if gain.shape[0] < freqs.shape[0]:
        gain = jnp.pad(gain, (0, freqs.shape[0] - gain.shape[0]))
    # ×fs converts the continuous-FT waveform (strain·s) to the discrete
    # rDFT convention, so the whitened template is in the same units as
    # unit-variance whitened noise — the σ=1 normalization the GAN assumes.
    # (The reference patched this convention mismatch empirically with its
    # hard-coded ×817.98 event scale, bbhMahoGANy.py:1028; here it is exact.)
    amp = amp * (gain[: freqs.shape[0]] * K * cfg.fs)
    phase = phase + (delta + 2.0 * cfg.phi)
    phase = phase + 2.0 * jnp.pi * freqs * jnp.asarray(tdelay, dtype)

    # ---- pass A: localize the envelope peak near t=0 ------------------
    # (replaces ref_idx argmax over hp²+hc², ref: :521-528; the envelope of
    # the quadrature pair equals the antenna-projected envelope up to scale)
    w = 2 * _PEAK_SEARCH
    if use_pallas:
        from gennet_tpu.ops.phasor_dft import phasor_irdft_slice

        h_a = phasor_irdft_slice(amp, phase, N, N - _PEAK_SEARCH, w)
        q_a = phasor_irdft_slice(amp, phase + 0.5 * jnp.pi, N, N - _PEAK_SEARCH, w)
    else:
        re = amp[:, :nf] * jnp.cos(phase[:, :nf])
        im = -amp[:, :nf] * jnp.sin(phase[:, :nf])
        h_a = dft.irdft_slice(re, im, N, N - _PEAK_SEARCH, w)
        q_a = dft.irdft_slice(-im, re, N, N - _PEAK_SEARCH, w)
    peak = jnp.argmax(h_a * h_a + q_a * q_a, axis=-1).astype(jnp.int32)
    peak = peak - _PEAK_SEARCH  # offset relative to t=0, in (−S, S)

    # ---- pass B: exact circular shift as an FD phase ramp --------------
    # slide the peak to the requested index (ref slicing, :554-556), with the
    # reference's calibration offset exposed (default 0, ref used −11)
    shift = idx.astype(jnp.int32) + jnp.int32(cfg.calibration_offset) - peak
    dt_shift = shift.astype(dtype) / cfg.fs
    phase = phase + 2.0 * jnp.pi * freqs * dt_shift[:, None]

    # inverse-transform only the central second, with the aggressive centred
    # Tukey window (ref: :536-538,571) folded into the iDFT constants
    c0 = N // 2 - cfg.n_out // 2
    win = windows.centered_tukey_window_np(N, safe=cfg.safe)
    wslice = tuple(float(x) for x in win[c0 : c0 + cfg.n_out])
    if use_pallas:
        from gennet_tpu.ops.phasor_dft import phasor_irdft_slice

        return phasor_irdft_slice(amp, phase, N, c0, cfg.n_out, weights=wslice)
    re = amp[:, :nf] * jnp.cos(phase[:, :nf])
    im = -amp[:, :nf] * jnp.sin(phase[:, :nf])
    return dft.irdft_slice(re, im, N, c0, cfg.n_out, weights=wslice)


def make_event(key: jax.Array, psd: jnp.ndarray, cfg: BankConfig = BankConfig(),
               noise_sigma: float = 1.0):
    """Synthetic measured event: whitened GW150914-like template (central 1 s)
    + unit whitened noise, plus the bank normalization constant.

    Mirrors the reference's event construction when lalinference products are
    unavailable: the norm constant is 1/std of the measured (signal+noise)
    whitened series (ref: gw_template_maker.py:779-784), computed over the
    central second. Returns (h_signal, h_measured, norm_constant).
    """
    tmpl = make_event_template(psd, cfg)
    noise = noise_sigma * jax.random.normal(key, tmpl.shape, tmpl.dtype)
    measured = tmpl + noise
    norm = 1.0 / jnp.std(measured)
    return tmpl * norm, measured * norm, norm


def make_bank(key: jax.Array, n_total: int, psd: jnp.ndarray, cfg: BankConfig = BankConfig(),
              norm_constant: float = 1.0, batch: int = 4096, append_event_template: bool = True):
    """Host-side driver: build an ``n_total``-template bank in device batches.

    The event-twin template is appended last, as the reference guarantees
    (ref: sim_data, gw_template_maker.py:729-739). Returns (templates
    [n_total, fs], params dict of arrays) as numpy.
    """
    n_rand = n_total - int(append_event_template)
    chunks, parts = [], []
    done = 0
    while done < n_rand:
        key, sub = jax.random.split(key)
        m = min(batch, n_rand - done)
        # always synthesize a full batch (one compiled program, tile-aligned
        # for the Pallas kernel) and trim host-side
        t, p = make_template_batch(sub, batch, psd, cfg, norm_constant)
        chunks.append(np.asarray(t[:m]))
        parts.append({k: np.asarray(v[:m]) for k, v in p.items()})
        done += m
    templates = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, cfg.n_out), np.float32)
    params = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]} if parts else {}

    if append_event_template:
        ev = np.asarray(make_event_template(psd, cfg))[None] * norm_constant
        templates = np.concatenate([templates, ev], axis=0)
        mc, eta = priors.chirp_mass_eta(cfg.tmpl_m1, cfg.tmpl_m2)
        extra = {
            "m1": cfg.tmpl_m1, "m2": cfg.tmpl_m2, "mc": float(mc), "eta": float(eta),
            "M": cfg.tmpl_m1 + cfg.tmpl_m2, "q": cfg.tmpl_m2 / cfg.tmpl_m1,
            "idx": cfg.n_safe // 2,
        }
        for k in params:
            params[k] = np.append(params[k], extra[k])
    return templates, params


def make_bank_sharded(key: jax.Array, n_total: int, psd: jnp.ndarray, mesh,
                      cfg: BankConfig = BankConfig(), norm_constant: float = 1.0):
    """Data-parallel bank synthesis over a mesh 'data' axis.

    Each device synthesizes its shard of the sample axis independently (no
    collectives needed — generation is embarrassingly parallel; the result is
    a globally-sharded array the caller may keep device-resident for
    training or all_gather for writing). ``n_total`` must divide by the mesh
    size.
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["data"]
    assert n_total % n_dev == 0, "n_total must be divisible by mesh data axis"

    keys = jax.random.split(key, n_dev)

    def shard_fn(k, psd_local):
        t, p = make_template_batch(k[0], n_total // n_dev, psd_local, cfg, norm_constant)
        return t, p

    shard_fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=(P("data"), P("data")),
    )
    return shard_fn(keys, jnp.asarray(psd))
