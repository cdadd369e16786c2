"""Independent float64 numpy re-derivation of IMRPhenomD (nonspinning).

Golden-value generator for validating ``gennet_tpu.physics.waveform``
(VERDICT.md round-1 item 3: "a transcription error in any single fit
constant makes a test fail").

This file deliberately does NOT import anything from ``gennet_tpu``. It is a
second, structurally-different transcription of the published model:

- Khan et al. 2016 (PhysRevD.93.044007, arXiv:1508.07253) Table V
  phenomenological coefficients, written here as one explicit closed-form
  expression per coefficient — the layout of the published per-coefficient
  equations — instead of the repo's packed (19, 11) basis-matrix table, so
  row/column transpositions, basis-ordering mistakes, and ξ-definition
  errors in either copy cause disagreement;
- Husa et al. 2016 (arXiv:1508.07250) final-spin and radiated-energy fits;
- Berti-Cardoso-Will l=m=2, n=0 QNM frequency/quality fits;
- 3.5PN TaylorF2 phasing and 3PN PN amplitude series (nonspinning);
- the three-region phase with C(1) stitching at Mf=0.018 and Mf=f_RD/2, and
  the three-region amplitude with the quartic collocation polynomial over
  [0.014, f_peak], per the paper's Secs. V-VI;
- the repo's documented phase gauge (group delay zeroed at the amplitude
  peak, applied as −t0·(Mf − 0.018)); a pure linear-in-f gauge term, free in
  the SPA construction — it cannot affect any physical overlap.

Everything is evaluated in float64. Spins are fixed to zero (the only
sector the reference exercises: gw_template_maker.py:508-509), so ξ = −1
exactly and the spin-orbit PN terms vanish.

Run as a script to (re)generate ``phenomd_goldens.json``.
"""

import json
import os

import numpy as np

PI = np.pi
GAMMA_E = 0.5772156649015329  # Euler-Mascheroni
MTSUN_SI = 4.925491025543576e-06  # G M_sun / c^3 [s]
MPC_SI = 3.085677581491367e22     # [m]
C_SI = 299792458.0                # [m/s]
STRAIN_SCALE = 1.0e21             # repo-wide strain unit (constants.STRAIN_SCALE)


# ---------------------------------------------------------------------
# Table V coefficients, one explicit expression each (ξ = chiPN − 1;
# nonspinning ⇒ chiPN = 0, ξ = −1)
# ---------------------------------------------------------------------

def rho1_fun(eta, xi):
    eta2 = eta * eta
    return (3931.8979897196696 - 17395.758706812805 * eta
            + (3132.375545898835 + 343965.86092361377 * eta - 1.2162565819981997e6 * eta2) * xi
            + (-70698.00600428853 + 1.383907177859705e6 * eta - 3.9662761890979446e6 * eta2) * xi * xi
            + (-60017.52423652596 + 803515.1181825735e0 * eta - 2.091710365941658e6 * eta2) * xi * xi * xi)


def rho2_fun(eta, xi):
    eta2 = eta * eta
    return (-40105.47653771657 + 112253.0169706701 * eta
            + (23561.696065836168 - 3.476180699403351e6 * eta + 1.137593670849482e7 * eta2) * xi
            + (754313.1127166454 - 1.308476044625268e7 * eta + 3.6444584853928134e7 * eta2) * xi * xi
            + (596226.612472288 - 7.4277901143564405e6 * eta + 1.8928977514040343e7 * eta2) * xi * xi * xi)


def rho3_fun(eta, xi):
    eta2 = eta * eta
    return (83208.35471266537 - 191237.7264145924 * eta
            + (-210916.2454782992 + 8.71797508352568e6 * eta - 2.6914942420669552e7 * eta2) * xi
            + (-1.9889806527362722e6 + 3.0888029960154563e7 * eta - 8.390870279256162e7 * eta2) * xi * xi
            + (-1.4535031953446497e6 + 1.7063528990822166e7 * eta - 4.2748659731120914e7 * eta2) * xi * xi * xi)


def v2_fun(eta, xi):
    eta2 = eta * eta
    return (0.8149838730507785 + 2.5747553517454658 * eta
            + (1.1610198035496786 - 2.3627771785551537 * eta + 6.771038707057573 * eta2) * xi
            + (0.7570782938606834 - 2.7256896890432474 * eta + 7.1140380397149965 * eta2) * xi * xi
            + (0.1766934149293479 - 0.7978690983168183 * eta + 2.1162391502005153 * eta2) * xi * xi * xi)


def gamma1_fun(eta, xi):
    eta2 = eta * eta
    return (0.006927402739328343 + 0.03020474290328981 * eta
            + (0.006308024337706171 - 0.12074130661131138 * eta + 0.26271598905781324 * eta2) * xi
            + (0.0034151773647198794 - 0.10779338611188374 * eta + 0.27098966966891747 * eta2) * xi * xi
            + (0.0007374185938559283 - 0.02749621038376281 * eta + 0.0733150789135702 * eta2) * xi * xi * xi)


def gamma2_fun(eta, xi):
    eta2 = eta * eta
    return (1.010344404799477 + 0.0008993122007234548 * eta
            + (0.283949116804459 - 4.049752962958005 * eta + 13.207828172665366 * eta2) * xi
            + (0.10396278486805426 - 7.025059158961947 * eta + 24.784892370130475 * eta2) * xi * xi
            + (0.03093202475605892 - 2.6924023896851663 * eta + 9.609374464684983 * eta2) * xi * xi * xi)


def gamma3_fun(eta, xi):
    eta2 = eta * eta
    return (1.3081615607036106 - 0.005537729694807678 * eta
            + (-0.06782917938621007 - 0.6689834970767117 * eta + 3.403147966134083 * eta2) * xi
            + (-0.05296577374411866 - 0.9923793203111362 * eta + 4.820681208409587 * eta2) * xi * xi
            + (-0.006134139870393713 - 0.38429253308696365 * eta + 1.7561754421985984 * eta2) * xi * xi * xi)


def sigma1_fun(eta, xi):
    eta2 = eta * eta
    return (2096.551999295543 + 1463.7493168261553 * eta
            + (1312.5493286098522 + 18307.330017082117 * eta - 43534.1440746107 * eta2) * xi
            + (-833.2889543511114 + 32047.31997183187 * eta - 108609.45037520859 * eta2) * xi * xi
            + (452.25136398112204 + 8353.439546391714 * eta - 44531.3250037322 * eta2) * xi * xi * xi)


def sigma2_fun(eta, xi):
    eta2 = eta * eta
    return (-10114.056472621156 - 44631.01109458185 * eta
            + (-6541.308761668722 - 266959.23419307504 * eta + 686328.3229317984 * eta2) * xi
            + (3405.6372187679685 - 437507.7208209015 * eta + 1.6318171307344697e6 * eta2) * xi * xi
            + (-7462.648563007646 - 114585.25177153319 * eta + 674402.4689098676 * eta2) * xi * xi * xi)


def sigma3_fun(eta, xi):
    eta2 = eta * eta
    return (22933.658273436497 + 230960.00814979506 * eta
            + (14961.083974183695 + 1.1940181342318142e6 * eta - 3.1042239693052764e6 * eta2) * xi
            + (-3038.166617199259 + 1.8720322849093592e6 * eta - 7.309145012085539e6 * eta2) * xi * xi
            + (42738.22871475411 + 467502.018616601 * eta - 3.064853498512499e6 * eta2) * xi * xi * xi)


def sigma4_fun(eta, xi):
    eta2 = eta * eta
    return (-14621.71522218357 - 377812.8579387104 * eta
            + (-9608.682631509726 - 1.7108925257214056e6 * eta + 4.332924601416521e6 * eta2) * xi
            + (-22366.683262266528 - 2.5019716386377467e6 * eta + 1.0274495902259542e7 * eta2) * xi * xi
            + (-85360.30079034246 - 570025.3441737515 * eta + 4.396844346849777e6 * eta2) * xi * xi * xi)


def beta1_fun(eta, xi):
    eta2 = eta * eta
    return (97.89747327985583 - 42.659730877489224 * eta
            + (153.48421037904913 - 1417.0620760768954 * eta + 2752.8614143665027 * eta2) * xi
            + (138.7406469558649 - 1433.6585075135881 * eta + 2857.7418952430758 * eta2) * xi * xi
            + (41.025109467376126 - 423.680737974639 * eta + 850.3594335657173 * eta2) * xi * xi * xi)


def beta2_fun(eta, xi):
    eta2 = eta * eta
    return (-3.282701958759534 - 9.051384468245866 * eta
            + (-12.415449742258042 + 55.4716447709787 * eta - 106.05109938966335 * eta2) * xi
            + (-11.953044553690658 + 76.80704618365418 * eta - 155.33172948098394 * eta2) * xi * xi
            + (-3.4129261592393263 + 25.572377569952536 * eta - 54.408036707740465 * eta2) * xi * xi * xi)


def beta3_fun(eta, xi):
    eta2 = eta * eta
    return (-2.5156429818799565e-5 + 1.9750256942201327e-5 * eta
            + (-1.8370671469295915e-5 + 2.1886317041311973e-5 * eta + 8.250240316860033e-5 * eta2) * xi
            + (7.157371250566708e-6 - 5.5780000112270685e-5 * eta + 1.9142082884072178e-4 * eta2) * xi * xi
            + (5.447166261464217e-6 - 3.220610095021982e-5 * eta + 7.974016714984341e-5 * eta2) * xi * xi * xi)


def alpha1_fun(eta, xi):
    eta2 = eta * eta
    return (43.31514709695348 + 638.6332679188081 * eta
            + (-32.85768747216059 + 2415.8938269370315 * eta - 5766.875169379177 * eta2) * xi
            + (-61.85459307173841 + 2953.967762459948 * eta - 8986.29057591497 * eta2) * xi * xi
            + (-21.571435779762044 + 981.2158224673428 * eta - 3239.5664895930286 * eta2) * xi * xi * xi)


def alpha2_fun(eta, xi):
    eta2 = eta * eta
    return (-0.07020209449091723 - 0.16269798450687084 * eta
            + (-0.1872514685185499 + 1.138313650449945 * eta - 2.8334196304430046 * eta2) * xi
            + (-0.17137955686840617 + 1.7197549338119527 * eta - 4.539717148261272 * eta2) * xi * xi
            + (-0.049983437357548705 + 0.6062072055948309 * eta - 1.682769616644546 * eta2) * xi * xi * xi)


def alpha3_fun(eta, xi):
    eta2 = eta * eta
    return (9.5988072383479 - 397.05438595557433 * eta
            + (16.202126189517813 - 1574.8286986717037 * eta + 3600.3410843831093 * eta2) * xi
            + (27.092429659075467 - 1786.482357315139 * eta + 5152.919378666511 * eta2) * xi * xi
            + (11.175710130033895 - 577.7999423177481 * eta + 1808.730762932043 * eta2) * xi * xi * xi)


def alpha4_fun(eta, xi):
    eta2 = eta * eta
    return (-0.02989487384493607 + 1.4022106448583738 * eta
            + (-0.07356049468633846 + 0.8337006542278661 * eta + 0.2240008282397391 * eta2) * xi
            + (-0.055202870001177226 + 0.5667186343606578 * eta + 0.7186931973380503 * eta2) * xi * xi
            + (-0.015507437354325743 + 0.15750322779277187 * eta + 0.21076815715176228 * eta2) * xi * xi * xi)


def alpha5_fun(eta, xi):
    eta2 = eta * eta
    return (0.9974408278363099 - 0.007884449714907203 * eta
            + (-0.059046901195591035 + 1.3958712396764088 * eta - 4.516631601676276 * eta2) * xi
            + (-0.05585343136869692 + 1.7516580039343603 * eta - 5.990208965347804 * eta2) * xi * xi
            + (-0.017945336522161195 + 0.5965097794825992 * eta - 2.0608879367971804 * eta2) * xi * xi * xi)


# ---------------------------------------------------------------------
# Final state + ringdown (nonspinning: s = 0)
# ---------------------------------------------------------------------

def final_spin(eta):
    """FinalSpin0815, arXiv:1508.07250 Eq. (3.6), s=0."""
    return (3.4641016151377544 * eta - 4.399247300629289 * eta**2
            + 9.397292189321194 * eta**3 - 13.180949901606242 * eta**4)


def radiated_energy(eta):
    """EradRational0815, arXiv:1508.07250 Eq. (3.7)-(3.8), s=0."""
    return (0.055974469826360077 * eta + 0.5809510763115132 * eta**2
            - 0.9606726679372312 * eta**3 + 3.352411249771192 * eta**4)


def ringdown_freqs(eta):
    """(f_RD, f_damp) in units of 1/M_initial: BCW l=m=2 n=0 fits rescaled by
    the final mass."""
    a = final_spin(eta)
    erad = radiated_energy(eta)
    omega = 1.5251 - 1.1568 * (1.0 - a) ** 0.1292
    quality = 0.7000 + 1.4187 * (1.0 - a) ** (-0.4990)
    f_rd = omega / (2.0 * PI) / (1.0 - erad)
    return f_rd, f_rd / (2.0 * quality)


# ---------------------------------------------------------------------
# TaylorF2 3.5PN phasing + 3PN amplitude series (nonspinning)
# ---------------------------------------------------------------------

def tf2_phase(Mf, eta):
    v = (PI * Mf) ** (1.0 / 3.0)
    eta2, eta3 = eta**2, eta**3
    p = np.zeros_like(np.asarray(Mf, np.float64))
    p = 1.0 \
        + (3715.0 / 756.0 + 55.0 * eta / 9.0) * v**2 \
        + (-16.0 * PI) * v**3 \
        + (15293365.0 / 508032.0 + 27145.0 * eta / 504.0 + 3085.0 * eta2 / 72.0) * v**4 \
        + PI * (38645.0 / 756.0 - 65.0 * eta / 9.0) * (1.0 + 3.0 * np.log(v)) * v**5 \
        + (11583231236531.0 / 4694215680.0 - 640.0 * PI**2 / 3.0
           - 6848.0 * GAMMA_E / 21.0 - 6848.0 / 21.0 * np.log(4.0 * v)
           + (-15737765635.0 / 3048192.0 + 2255.0 * PI**2 / 12.0) * eta
           + 76055.0 * eta2 / 1728.0 - 127825.0 * eta3 / 1296.0) * v**6 \
        + PI * (77096675.0 / 254016.0 + 378515.0 * eta / 1512.0
                - 74045.0 * eta2 / 756.0) * v**7
    return 3.0 / (128.0 * eta * v**5) * p - PI / 4.0


def dtf2_phase(Mf, eta, h=1e-7):
    """dΨ/dMf by 5-point central differences (float64 is ample here)."""
    return (-tf2_phase(Mf + 2 * h, eta) + 8 * tf2_phase(Mf + h, eta)
            - 8 * tf2_phase(Mf - h, eta) + tf2_phase(Mf - 2 * h, eta)) / (12 * h)


def amp_pn(Mf, eta):
    v = (PI * Mf) ** (1.0 / 3.0)
    eta2, eta3 = eta**2, eta**3
    return (1.0
            + (-323.0 / 224.0 + 451.0 * eta / 168.0) * v**2
            + (-27312085.0 / 8128512.0 - 1975055.0 * eta / 338688.0
               + 105271.0 * eta2 / 24192.0) * v**4
            + (-85.0 * PI / 64.0 + 85.0 * PI * eta / 16.0) * v**5
            + (-177520268561.0 / 8583708672.0
               + (545384828789.0 / 5007163392.0 - 205.0 * PI**2 / 48.0) * eta
               - 3248849057.0 * eta2 / 178827264.0
               + 34473079.0 * eta3 / 6386688.0) * v**6)


def damp_pn(Mf, eta, h=1e-8):
    return (-amp_pn(Mf + 2 * h, eta) + 8 * amp_pn(Mf + h, eta)
            - 8 * amp_pn(Mf - h, eta) + amp_pn(Mf - 2 * h, eta)) / (12 * h)


# ---------------------------------------------------------------------
# PhenomD assembly (nonspinning)
# ---------------------------------------------------------------------

F_PHASE_SPLIT = 0.018
F_AMP_SPLIT = 0.014


def coefficients(eta):
    xi = -1.0  # chiPN = 0
    return {name[:-4]: fn(eta, xi) for name, fn in globals().items()
            if name.endswith("_fun")}


def phase_regions(eta):
    """Return callables (phase(Mf), dphase(Mf)) with C(1) stitching and the
    repo's peak-group-delay gauge applied."""
    c = coefficients(eta)
    f_rd, f_damp = ringdown_freqs(eta)

    def phi_ins(Mf):
        sig = (c["sigma1"] * Mf + 0.75 * c["sigma2"] * Mf ** (4.0 / 3.0)
               + 0.6 * c["sigma3"] * Mf ** (5.0 / 3.0) + 0.5 * c["sigma4"] * Mf**2)
        return tf2_phase(Mf, eta) + sig / eta

    def dphi_ins(Mf):
        dsig = (c["sigma1"] + c["sigma2"] * Mf ** (1.0 / 3.0)
                + c["sigma3"] * Mf ** (2.0 / 3.0) + c["sigma4"] * Mf)
        return dtf2_phase(Mf, eta) + dsig / eta

    def phi_int_raw(Mf):
        return (c["beta1"] * Mf + c["beta2"] * np.log(Mf)
                - c["beta3"] / 3.0 * Mf ** (-3.0)) / eta

    def dphi_int_raw(Mf):
        return (c["beta1"] + c["beta2"] / Mf + c["beta3"] * Mf ** (-4.0)) / eta

    f1 = F_PHASE_SPLIT
    c2i = dphi_ins(f1) - dphi_int_raw(f1)
    c1i = phi_ins(f1) - phi_int_raw(f1) - c2i * f1

    def phi_int(Mf):
        return phi_int_raw(Mf) + c1i + c2i * Mf

    def dphi_int(Mf):
        return dphi_int_raw(Mf) + c2i

    def phi_mr_raw(Mf):
        return (c["alpha1"] * Mf - c["alpha2"] / Mf
                + 4.0 / 3.0 * c["alpha3"] * Mf**0.75
                + c["alpha4"] * np.arctan((Mf - c["alpha5"] * f_rd) / f_damp)) / eta

    def dphi_mr_raw(Mf):
        return (c["alpha1"] + c["alpha2"] / Mf**2 + c["alpha3"] * Mf ** (-0.25)
                + c["alpha4"] * f_damp / (f_damp**2 + (Mf - c["alpha5"] * f_rd) ** 2)) / eta

    f2 = 0.5 * f_rd
    c2m = dphi_int(f2) - dphi_mr_raw(f2)
    c1m = phi_int(f2) - phi_mr_raw(f2) - c2m * f2

    # gauge: zero group delay at the amplitude peak (repo convention)
    f_peak = amp_peak_freq(c, f_rd, f_damp)
    t0 = dphi_mr_raw(f_peak) + c2m

    def phase(Mf):
        Mf = np.asarray(Mf, np.float64)
        raw = np.where(Mf < f1, phi_ins(np.maximum(Mf, 1e-9)),
                       np.where(Mf < f2, phi_int(Mf), phi_mr_raw(Mf) + c1m + c2m * Mf))
        return raw - t0 * (Mf - f1)

    return phase


def amp_peak_freq(c, f_rd, f_damp):
    g2 = c["gamma2"]
    g3fd = c["gamma3"] * f_damp
    if g2 <= 1.0:
        return abs(f_rd + g3fd * (np.sqrt(1.0 - g2**2) - 1.0) / g2)
    return abs(f_rd - g3fd / g2)


def amp_regions(eta):
    """Relative amplitude Â(Mf) (the f^{-7/6} leading factor divided out)."""
    c = coefficients(eta)
    f_rd, f_damp = ringdown_freqs(eta)

    def a_ins(Mf):
        return (amp_pn(Mf, eta) + c["rho1"] * Mf ** (7.0 / 3.0)
                + c["rho2"] * Mf ** (8.0 / 3.0) + c["rho3"] * Mf**3)

    def da_ins(Mf):
        return (damp_pn(Mf, eta) + 7.0 / 3.0 * c["rho1"] * Mf ** (4.0 / 3.0)
                + 8.0 / 3.0 * c["rho2"] * Mf ** (5.0 / 3.0) + 3.0 * c["rho3"] * Mf**2)

    def a_mr(Mf):
        g3fd = c["gamma3"] * f_damp
        d = Mf - f_rd
        return c["gamma1"] * g3fd / (d**2 + g3fd**2) * np.exp(-c["gamma2"] * d / g3fd)

    def da_mr(Mf, h=1e-8):
        return (-a_mr(Mf + 2 * h) + 8 * a_mr(Mf + h)
                - 8 * a_mr(Mf - h) + a_mr(Mf - 2 * h)) / (12 * h)

    f1 = F_AMP_SPLIT
    f3 = amp_peak_freq(c, f_rd, f_damp)
    f2 = 0.5 * (f1 + f3)
    v1, v2, v3 = a_ins(f1), v2_fun(eta, -1.0), a_mr(f3)
    d1, d3 = da_ins(f1), da_mr(f3)

    # quartic through (f1,v1,d1), (f2,v2), (f3,v3,d3) — direct float64
    # Vandermonde (the repo solves the same system in normalized coords)
    A = np.array([
        [1.0, f1, f1**2, f1**3, f1**4],
        [0.0, 1.0, 2 * f1, 3 * f1**2, 4 * f1**3],
        [1.0, f2, f2**2, f2**3, f2**4],
        [1.0, f3, f3**2, f3**3, f3**4],
        [0.0, 1.0, 2 * f3, 3 * f3**2, 4 * f3**3],
    ])
    delta = np.linalg.solve(A, np.array([v1, d1, v2, v3, d3]))

    def rel_amp(Mf):
        Mf = np.asarray(Mf, np.float64)
        mid = sum(delta[k] * Mf**k for k in range(5))
        return np.where(Mf < f1, a_ins(np.maximum(Mf, 1e-9)),
                        np.where(Mf < f3, mid, a_mr(Mf)))

    return rel_amp


def htilde_ampphase(f_hz, m1, m2, dist_mpc=410.0, f_low=40.0, f_high=None):
    """(amp, phase) on a frequency grid [Hz] in the repo's conventions:
    strain in units of 1e-21 (STRAIN_SCALE), h̃ = amp·e^{−iΨ}, amp zeroed out
    of [f_low, f_high] (default ceiling Mf = 0.3)."""
    f_hz = np.asarray(f_hz, np.float64)
    m_sec = (m1 + m2) * MTSUN_SI
    eta = m1 * m2 / (m1 + m2) ** 2
    Mf = np.maximum(f_hz * m_sec, 1e-9)

    phase = phase_regions(eta)(Mf)
    amp0 = (STRAIN_SCALE * np.sqrt(5.0 / 24.0) / PI ** (2.0 / 3.0)
            * np.sqrt(eta) * m_sec**2 / (dist_mpc * MPC_SI / C_SI))
    amp = amp0 * Mf ** (-7.0 / 6.0) * amp_regions(eta)(Mf)

    if f_high is None:
        f_high = 0.3 / m_sec
    band = (f_hz >= f_low) & (f_hz <= f_high)
    return np.where(band, amp, 0.0), phase


# ---------------------------------------------------------------------
# Golden generation
# ---------------------------------------------------------------------

# pinned (m1, m2) spanning the hunt_constrain prior and beyond (VERDICT #3)
GOLDEN_MASSES = [
    (20.0, 20.0), (23.0, 23.0), (36.0, 29.0), (30.0, 15.0),
    (40.0, 40.0), (45.0, 25.0), (60.0, 40.0), (25.0, 12.5),
    (50.0, 10.0), (35.0, 30.0),
]
# pinned frequencies [Hz]: inspiral, intermediate, merger, ringdown coverage
GOLDEN_FREQS = [40.0, 60.0, 90.0, 130.0, 180.0, 250.0, 350.0, 500.0]


def generate():
    rows = []
    for m1, m2 in GOLDEN_MASSES:
        amp, phase = htilde_ampphase(np.array(GOLDEN_FREQS), m1, m2)
        rows.append({"m1": m1, "m2": m2, "freqs": GOLDEN_FREQS,
                     "amp": [float(a) for a in amp],
                     "phase": [float(p) for p in phase]})
    return {"conventions": "h=amp*exp(-i*phase), strain/1e-21, dist=410Mpc, "
                           "f_low=40Hz, gauge: -t0*(Mf-0.018)",
            "rows": rows}


if __name__ == "__main__":
    out = generate()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "phenomd_goldens.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {len(out['rows'])} mass rows")
