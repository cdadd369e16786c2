"""gennet_tpu — a TPU-native JAX framework for GAN-based gravitational-wave
parameter estimation.

A ground-up rebuild of the capabilities of hagabbar/GenNet (the "mahoGANy"
method: GAN waveform estimation + CNN parameter point-estimation + posterior
validation against lalinference), designed TPU-first:

- physics/   pure, vmap/jit-safe signal ops (waveforms, PSDs, whitening,
             noise, priors, detector response) replacing the reference's
             lalsuite C bindings (ref: BBH_version/gw_template_maker.py).
- data/      fused on-device template-bank synthesis sharded over a mesh
             (ref: gw_template_maker.py:632-866) and lalinference interop.
- models/    Flax generator / discriminator / CNN point-estimator families
             (ref: BBH_version/bbhMahoGANy.py:164-539).
- ops/       Pallas TPU kernels for the hot ops.
- train/     fused, jitted, psum-data-parallel train steps
             (ref: bbhMahoGANy.py:1144-1382 host loops, rebuilt device-side).
- eval/      posterior overlap statistics and analytic grid posteriors
             (ref: bbhMahoGANy.py:811-873; tests/burstMahoGANy.py:716-726).
- cli/       entry points: make-bank / train-cnn / train-gan / smoke.
"""

__version__ = "0.1.0"
