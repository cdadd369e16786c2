"""gennet-tpu CLI — make-bank / train-cnn / train-gan / smoke / sample-posterior.

Replaces the reference's shell drivers + __main__ scripts (ref: runGAN.sh,
gw_template_maker.py:743, bbhMahoGANy.py:959, burstMahoGANy.py:569) with one
typed entry point; every flag maps to a dataclass field (SURVEY.md §5.6).
"""

import argparse
import dataclasses
import json

import jax


def _add_dataclass_args(parser, dc_type, skip=()):
    for f in dataclasses.fields(dc_type):
        if f.name in skip:
            continue
        arg = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=f.default)
        elif f.default is None:
            parser.add_argument(arg, type=str, default=None)
        else:
            parser.add_argument(arg, type=type(f.default), default=f.default)


def _build_dataclass(args, dc_type):
    names = {f.name for f in dataclasses.fields(dc_type)}
    return dc_type(**{k: v for k, v in vars(args).items() if k in names})


def _mesh(args):
    if getattr(args, "data_parallel", False):
        from gennet_tpu.train.mesh import data_mesh

        return data_mesh()
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(prog="gennet-tpu",
                                     description="TPU-native GAN-based GW parameter estimation")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_bank = sub.add_parser("make-bank", help="generate a whitened template bank")
    p_bank.add_argument("-N", "--nsamp", type=int, default=50_000)
    p_bank.add_argument("-f", "--fsample", type=int, default=1024)
    p_bank.add_argument("-T", "--tobs", type=int, default=2)
    p_bank.add_argument("-m", "--mdist", type=str, default="hunt_constrain")
    p_bank.add_argument("-z", "--seed", type=int, default=1)
    p_bank.add_argument("-b", "--basename", type=str, default="templates/bank.npz")
    p_bank.add_argument("--beta", type=float, nargs=2, default=[0.45, 0.55])
    p_bank.add_argument("--data-parallel", action="store_true")
    p_bank.add_argument("--lalinf-dir", type=str, default=None)

    from gennet_tpu.cli.workloads import (
        BBHConfig,
        BlobToyConfig,
        BurstSmokeConfig,
        ImageGANConfig,
    )

    p_smoke = sub.add_parser("smoke", help="sine-Gaussian burst smoke workload")
    _add_dataclass_args(p_smoke, BurstSmokeConfig)
    p_smoke.add_argument("--data-parallel", action="store_true")

    p_blob = sub.add_parser("blob-toy", help="gen-1 blob-image toy (PE + MC-dropout + image GAN)")
    _add_dataclass_args(p_blob, BlobToyConfig)
    p_blob.add_argument("--data-parallel", action="store_true")

    p_img = sub.add_parser("image-gan", help="gen-1 image-directory GAN (face-image mode)")
    _add_dataclass_args(p_img, ImageGANConfig)
    p_img.add_argument("--data-parallel", action="store_true")

    for name, help_ in (("train-cnn", "train the CNN point estimator"),
                        ("train-gan", "train the GAN waveform estimator"),
                        ("train-bbh", "full flagship pipeline (CNN then GAN)")):
        p = sub.add_parser(name, help=help_)
        _add_dataclass_args(p, BBHConfig)
        p.add_argument("--data-parallel", action="store_true")

    p_mdc = sub.add_parser("make-mdc", help="build a hardware-injection MDC set "
                           "(sim_burst XML + per-injection ASCII strain files)")
    p_mdc.add_argument("--kind", choices=("sine-gaussian", "wnb"),
                       default="sine-gaussian")
    p_mdc.add_argument("-n", "--number", type=int, default=1000)
    p_mdc.add_argument("--gps-start", type=int, default=1126620016)
    p_mdc.add_argument("--gps-stop", type=int, default=1136995216)
    p_mdc.add_argument("--hrss", type=float, nargs=2, default=[5e-23, 1e-20])
    p_mdc.add_argument("--f-range", type=float, nargs=2, default=[100.0, 200.0])
    p_mdc.add_argument("-q", type=float, default=15.0)
    p_mdc.add_argument("--detectors", type=str, default="H1,L1")
    p_mdc.add_argument("--xml", type=str, default="mdc/set.xml.gz")
    p_mdc.add_argument("--render-dir", type=str, default=None,
                       help="also write per-injection ASCII strain files here")
    p_mdc.add_argument("--seed", type=int, default=3)

    p_samp = sub.add_parser("sample-posterior", help="draw posterior samples from trained models")
    _add_dataclass_args(p_samp, BBHConfig)
    p_samp.add_argument("--n-samples", type=int, default=4000)
    p_samp.add_argument("--out", type=str, default="posterior.npz")

    args = parser.parse_args(argv)

    # honor an explicit JAX_PLATFORMS=cpu even when the environment's
    # sitecustomize pre-pinned the TPU platform (config wins over env there)
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from gennet_tpu import runtime

    info = runtime.setup()
    print(json.dumps({"runtime": info}))

    if args.cmd == "make-bank":
        import numpy as np

        from gennet_tpu.data import lalinf_io, template_bank as tb
        from gennet_tpu.physics import psd as psd_mod

        cfg = tb.BankConfig(fs=args.fsample, T_obs=args.tobs, mdist=args.mdist,
                            beta=tuple(args.beta))
        norm = 1.0
        if args.lalinf_dir:
            prod = lalinf_io.load_event_products(args.lalinf_dir, fs=cfg.fs,
                                                 T_safe=cfg.T_obs * cfg.safe)
            psd, norm = prod["psd"], prod["norm_constant"]
        else:
            psd = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)
        key = jax.random.PRNGKey(args.seed)
        mesh = _mesh(args)
        if mesh is not None:
            n = args.nsamp - args.nsamp % mesh.shape["data"]
            t, p = tb.make_bank_sharded(key, n, psd, mesh, cfg, norm)
            t, p = np.asarray(t), {k: np.asarray(v) for k, v in p.items()}
        else:
            t, p = tb.make_bank(key, args.nsamp, psd, cfg, norm)
        import os

        os.makedirs(os.path.dirname(args.basename) or ".", exist_ok=True)
        if args.basename.endswith(".gntb"):
            from gennet_tpu.data import bankstore

            bankstore.write_bank(args.basename, t, p)
        else:
            lalinf_io.save_bank_npz(args.basename, t, p)
        print(json.dumps({"templates": int(t.shape[0]), "file": args.basename}))
        return

    if args.cmd == "smoke":
        from gennet_tpu.cli.workloads import run_burst_smoke

        out = run_burst_smoke(_build_dataclass(args, BurstSmokeConfig), mesh=_mesh(args))
        print(json.dumps(out))
        return

    if args.cmd == "blob-toy":
        from gennet_tpu.cli.workloads import run_blob_toy

        out = run_blob_toy(_build_dataclass(args, BlobToyConfig), mesh=_mesh(args))
        print(json.dumps(out))
        return

    if args.cmd == "image-gan":
        from gennet_tpu.cli.workloads import run_image_gan

        out = run_image_gan(_build_dataclass(args, ImageGANConfig), mesh=_mesh(args))
        print(json.dumps(out))
        return

    if args.cmd in ("train-cnn", "train-gan", "train-bbh"):
        from gennet_tpu.cli.workloads import run_bbh

        cfg = _build_dataclass(args, BBHConfig)
        if args.cmd == "train-cnn":
            cfg = dataclasses.replace(cfg, gan_iters=0)
        if args.cmd == "train-gan":
            cfg = dataclasses.replace(cfg, pe_iters=0, resume=True)
        out = run_bbh(cfg, mesh=_mesh(args))
        print(json.dumps(out))
        return

    if args.cmd == "make-mdc":
        import os

        import numpy as np

        from gennet_tpu.data import mdc_xml as M

        rng = np.random.default_rng(args.seed)
        mdcset = M.MDCSet(args.detectors.split(","))
        times = M.uniform_time(args.gps_start, args.gps_stop, args.number, rng=rng)
        hrss = M.log_uniform(args.hrss[0], args.hrss[1], args.number, rng=rng)
        for h, t in zip(hrss, times):
            if args.kind == "sine-gaussian":
                # ref make_hw-xml.py (sineGauss variant): q=15, f ~ U[100,200]
                mdcset + M.sine_gaussian(
                    q=args.q, frequency=float(rng.uniform(*args.f_range)),
                    hrss=float(h), time=float(t))
            else:
                # ref make_hw-xml.py (wnb variant): 0.1 s, 10 Hz bw @ 1 kHz
                mdcset + M.white_noise_burst(
                    duration=0.1, bandwidth=10.0, frequency=1000.0,
                    hrss=float(h), time=float(t), seed=args.seed)
        os.makedirs(os.path.dirname(args.xml) or ".", exist_ok=True)
        mdcset.save_xml(args.xml)
        out = {"injections": len(mdcset.injections), "xml": args.xml}
        if args.render_dir:
            out["files"] = len(M.render_injection_files(mdcset, args.render_dir))
        print(json.dumps(out))
        return

    if args.cmd == "sample-posterior":
        import numpy as np

        from gennet_tpu.cli.workloads import BBHConfig as _B
        from gennet_tpu.models import BBHGenerator, DualBranchPE, PairDiscriminator
        from gennet_tpu.train import CNNConfig, GANConfig, init_cnn, init_gan
        from gennet_tpu.train.checkpoints import CheckpointManager
        from gennet_tpu.train.cnn import predict as cnn_predict
        from gennet_tpu.train.gan import sample_generator

        cfg = _build_dataclass(args, _B)
        gan_cfg = GANConfig(n_pix=cfg.n_pix, batch_size=cfg.batch_size)
        G, D = BBHGenerator(n_out=cfg.n_pix), PairDiscriminator()
        gan_state = init_gan(jax.random.PRNGKey(0), G, D, gan_cfg)
        gan_state, _ = CheckpointManager(f"{cfg.out_dir}/ckpt_gan").restore(gan_state)
        pe_cfg = CNNConfig(n_pix=cfg.n_pix)
        pe = DualBranchPE()
        pe_state = init_cnn(jax.random.PRNGKey(1), pe, pe_cfg)
        pe_state, _ = CheckpointManager(f"{cfg.out_dir}/ckpt_pe").restore(pe_state)
        use_ema = cfg.pe_ema_decay > 0  # match the training run's eval path
        wf = sample_generator(G, gan_state, jax.random.PRNGKey(cfg.seed), args.n_samples, gan_cfg)
        samples = np.asarray(cnn_predict(pe, pe_state, wf, use_ema=use_ema))
        extra = {}
        resampled = False
        if (cfg.select_route == "elbo" or cfg.pe_debias > 0
                or cfg.pe_bootcal > 0 or cfg.pe_mlrc > 0
                or cfg.reweight_temper > 0):
            # truth-free calibration of the product cloud (same stack as
            # run_bbh's eval path) — the event rebuild is shared with the
            # training run (_prepare_bbh_data: same k_ev split), so
            # `measured` is bit-identical to what training saw
            import jax.numpy as jnp

            from gennet_tpu.cli.workloads import _prepare_bbh_data
            from gennet_tpu.data import template_bank as tb
            from gennet_tpu.eval import posterior_post as pp
            from gennet_tpu.physics import priors

            (_, _, _, measured, norm, psd, _, _, _) = _prepare_bbh_data(
                cfg, jax.random.PRNGKey(cfg.seed), skip_bank=True)
            bank_cfg = tb.BankConfig()

            def synth(sm):
                sm = jnp.asarray(sm)
                mc = jnp.clip(sm[:, 0], 5.0, 60.0)
                q = jnp.clip(sm[:, 1], 0.2, 1.0)
                m1s, m2s = priors.mc_q_to_m1m2(mc, q)
                return tb.make_templates_from_params(m1s, m2s, psd, bank_cfg,
                                                     norm)

            cnn = lambda w: cnn_predict(pe, pe_state, w, use_ema=use_ema)
            key = jax.random.PRNGKey(cfg.seed + 7)
            if cfg.select_route == "elbo":
                route, samples, scores = pp.select_route(
                    samples, synth, cnn, measured, cfg.n_sig, key,
                    temper=(cfg.reweight_temper if cfg.reweight_temper > 0
                            else 1.0))
                extra["route"] = route
                resampled = route.endswith("reweight")
            else:
                if cfg.pe_debias > 0:
                    key, kd = jax.random.split(key)
                    samples = pp.self_calibrate(samples, synth, cnn, kd,
                                                cfg.n_sig,
                                                rounds=cfg.pe_debias)
                if cfg.pe_bootcal > 0:
                    key, kb = jax.random.split(key)
                    samples = pp.bootstrap_calibrate(samples, synth, cnn,
                                                     kb, cfg.n_sig)
                if cfg.pe_mlrc > 0:
                    key, km = jax.random.split(key)
                    samples = pp.ml_recenter(samples, synth, measured, km)
                if cfg.reweight_temper > 0:
                    key, kr = jax.random.split(key)
                    samples = pp.likelihood_resample(
                        samples, synth, measured, cfg.n_sig, kr,
                        temper=cfg.reweight_temper)
                    resampled = True
        # resampling reorders/duplicates cloud rows, so samples[i] no longer
        # pairs with wf[i] — store the draws under a different key then so
        # consumers cannot silently mis-pair rows
        wf_key = "waveforms_unpaired" if resampled else "waveforms"
        np.savez_compressed(args.out, samples=samples,
                            **{wf_key: np.asarray(wf)})
        print(json.dumps({"samples": int(samples.shape[0]),
                          "file": args.out,
                          "waveforms_key": wf_key, **extra}))
        return


if __name__ == "__main__":
    main()
