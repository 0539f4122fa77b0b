#!/usr/bin/env python3
"""Training driver — CLI-compatible with the reference's ``train.py``
(SURVEY.md §3.2): build input pipeline + model + loss + optimizer, restore
the latest checkpoint from logdir, run the step loop with summary and
checkpoint hooks.

TPU-native shape: one jitted train step per input dim (multi-scale buckets),
batch sharded over a (data, model) device mesh, gradients all-reduced by
XLA over ICI, Orbax checkpoints, jsonl metrics.

Usage: python3 cli/train.py -c config.ini [overrides...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolojax.utils.cli import make_parser, setup  # noqa: E402


def main():
    parser = make_parser(__doc__)
    parser.add_argument("--init-weights", default="",
                        help="npz params (converted Darknet/TF1) to start from")
    parser.add_argument("--transfer", default="",
                        help="comma list of param names to re-init (e.g. the "
                             "head conv when transferring across class counts)")
    args = parser.parse_args()
    cfg = setup(args)

    import dataclasses
    import itertools
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolojax.parallel.distributed import global_batch, maybe_initialize

    multi_process = maybe_initialize(
        cfg.train.coordinator, cfg.train.num_processes, cfg.train.process_id
    )

    from yolojax.convert.store import load_params_npz
    from yolojax.data.cache import load_cache
    from yolojax.data.grain_loader import make_loader
    from yolojax.parallel.mesh import (
        make_mesh,
        opt_state_shardings,
        param_shardings,
        replicated,
        shard_batch,
    )
    from yolojax.train.checkpoint import Checkpointer
    from yolojax.train.step import (
        MultiScaleSchedule,
        TrainState,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from yolojax.utils.metrics import MetricsLogger
    from yolojax.utils.profiling import StepTimer, enable_debug_nans, profile_trace

    log = logging.getLogger("train")
    tcfg = cfg.train
    if tcfg.debug_nans:
        enable_debug_nans(True)

    model = cfg.build_model()
    logdir = os.path.join(
        tcfg.logdir, f"{cfg.model.model}_{cfg.model.inference}"
    )
    os.makedirs(logdir, exist_ok=True)

    # ---- data --------------------------------------------------------------
    cache = load_cache(cfg.cache.basedir, "train")
    queue_cfg = cfg.queue
    if multi_process:
        # disjoint per-process shards; per-process batch = global / processes
        queue_cfg = dataclasses.replace(
            queue_cfg,
            batch_size=cfg.queue.batch_size // jax.process_count(),
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
    loader = make_loader(cache, queue_cfg, queue_cfg.loader)
    if len(loader) == 0:
        raise SystemExit(
            f"cache has {len(cache)} images < batch_size "
            f"{cfg.queue.batch_size}; no full batch per epoch"
        )
    log.info("train cache: %d images, %d classes", len(cache),
             model.num_classes)

    # ---- mesh + state -------------------------------------------------------
    mesh = make_mesh(
        data=(tcfg.mesh_data or None), model=tcfg.mesh_model
    )
    log.info("mesh: %s over %d devices (%s)", dict(mesh.shape),
             len(mesh.devices.flat), jax.devices()[0].platform)
    tx = make_optimizer(cfg.optimizer)
    ts = init_train_state(model, tx, jax.random.PRNGKey(tcfg.seed),
                          cfg.model.dim)
    if args.init_weights:
        params, bn_state = load_params_npz(args.init_weights)
        drop = set(filter(None, args.transfer.split(",")))
        merged = dict(ts.params)
        for k, v in params.items():
            if k not in drop:
                merged[k] = jax.tree_util.tree_map(jnp.asarray, v)
        merged_state = dict(ts.bn_state)
        for k, v in bn_state.items():
            if k not in drop:
                merged_state[k] = jax.tree_util.tree_map(jnp.asarray, v)
        ts = ts._replace(params=merged, bn_state=merged_state)
        log.info("initialized from %s (re-init: %s)", args.init_weights,
                 sorted(drop) or "none")

    ckpt = Checkpointer(os.path.join(logdir, "ckpt"),
                        max_to_keep=tcfg.keep_checkpoints,
                        save_interval_steps=tcfg.save_steps)
    start_step, ts = ckpt.restore_latest(ts)
    if start_step is not None:
        log.info("resumed from step %d", start_step)
    # Placement: with mesh_model > 1 the fat conv channels are TP-sharded
    # over the "model" axis (GSPMD inserts the all-gathers/reduce-scatters
    # over ICI); bn/opt state and everything below the threshold replicate.
    # With model=1 this degrades to pure replication.
    # train.zero: ZeRO-1 layout — each DP chip stores 1/N of the momentum/
    # Adam/EMA buffers; GSPMD lowers the update to reduce-scatter + local
    # update + all-gather over ICI (yolojax/parallel/mesh.py docstring)
    zero_on = tcfg.zero and mesh.shape["data"] > 1
    if zero_on:
        opt_put = jax.tree_util.tree_map(
            jax.device_put, ts.opt_state,
            opt_state_shardings(mesh, ts.opt_state))
        log.info("ZeRO-1: optimizer state sharded over data=%d",
                 mesh.shape["data"])
    else:
        opt_put = jax.device_put(ts.opt_state, replicated(mesh))
    ts = TrainState(
        jax.device_put(ts.step, replicated(mesh)),
        jax.tree_util.tree_map(
            jax.device_put, ts.params, param_shardings(mesh, ts.params)
        ),
        jax.device_put(ts.bn_state, replicated(mesh)),
        opt_put,
    )
    # Host pulls need a replicated-gather when any leaf is sharded across
    # PROCESSES: TP (model axis) always; ZeRO-1 opt state (data axis) when
    # the data axis spans processes (multi-process) — plain device_get on a
    # non-addressable shard raises.
    needs_gather = mesh.shape["model"] > 1 or (multi_process and zero_on)
    if needs_gather:
        # Non-addressable leaves (TP-sharded, or ZeRO-sharded across hosts):
        # reshard to replicated through a jitted identity (XLA all-gather
        # over ICI/DCN) before pulling to host for checkpoints/eval.
        # CAUTION: under multi-process this is a COLLECTIVE — every call
        # site must be entered by ALL processes together (see gather_all
        # below), never from a primary-only branch, or the job deadlocks.
        _gather = jax.jit(lambda t: t, out_shardings=replicated(mesh))

        def host_state(t):
            return jax.device_get(_gather(t))
    else:
        host_state = jax.device_get
    # primary-only summary branches must still enter host_state on every
    # process when it is a collective (multi-process TP or ZeRO-1)
    gather_all = multi_process and needs_gather

    compute_dtype = jnp.bfloat16 if tcfg.compute_dtype == "bfloat16" else jnp.float32
    step_fn = make_train_step(
        model, tx, loss_cfg=cfg.loss_config(), aug_cfg=cfg.augment,
        augment=True, compute_dtype=compute_dtype, remat=tcfg.remat,
    )
    msched = (
        MultiScaleSchedule(
            dims=tuple(range(tcfg.multi_scale_min, tcfg.multi_scale_max + 1,
                             model.downsample)),
            every=tcfg.multi_scale_every, seed=tcfg.seed,
        )
        if tcfg.multi_scale and model.kind == "v2"
        else None
    )

    is_primary = jax.process_index() == 0
    metrics_log = (
        MetricsLogger(logdir, tensorboard=tcfg.tensorboard)
        if is_primary else None
    )
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    timer = StepTimer()

    def batches():
        for epoch in itertools.count():
            yield from loader.epoch(epoch)

    # Grain loader: use the checkpointable infinite stream so training
    # resumes EXACTLY mid-epoch; its byte state is saved next to every
    # Orbax checkpoint and restored by step number.
    from yolojax.data.grain_loader import GrainLoader

    grain_stream = loader.stream() if isinstance(loader, GrainLoader) else None
    batch_iter = grain_stream if grain_stream is not None else batches()
    loader_state_dir = os.path.join(logdir, "loader_state")
    # each process streams its OWN grain shard (shard_index=process_index):
    # state files are per-process, or a shared logdir would make every
    # process clobber one file and resume replaying the same shard
    _proc = jax.process_index()

    def _state_path(step):
        return os.path.join(loader_state_dir, f"{int(step)}.p{_proc}.bin")

    def save_loader_state(step):
        if grain_stream is None:
            return
        os.makedirs(loader_state_dir, exist_ok=True)
        with open(_state_path(step), "wb") as f:
            f.write(grain_stream.get_state())
        # prune alongside the checkpoint manager's max_to_keep
        suffix = f".p{_proc}.bin"
        kept = sorted((int(p[: -len(suffix)])
                       for p in os.listdir(loader_state_dir)
                       if p.endswith(suffix)), reverse=True)
        for old in kept[max(tcfg.keep_checkpoints, 1):]:
            os.unlink(_state_path(old))
        if _proc == 0:  # pre-suffix layout files would otherwise pile up
            for p in os.listdir(loader_state_dir):
                if p.endswith(".bin") and p[:-4].isdigit():
                    os.unlink(os.path.join(loader_state_dir, p))

    if grain_stream is not None and start_step is not None:
        state_file = _state_path(start_step)
        if not os.path.exists(state_file) and _proc == 0:
            # pre-per-process-suffix layout (<step>.bin): honor it on the
            # primary so old runs keep their mid-epoch resume guarantee
            legacy = os.path.join(loader_state_dir, f"{int(start_step)}.bin")
            if os.path.exists(legacy):
                state_file = legacy
        if os.path.exists(state_file):
            with open(state_file, "rb") as f:
                grain_stream.set_state(f.read())
            log.info("restored grain loader state for step %d", start_step)
        else:
            log.warning("no loader state for step %d; grain stream "
                        "restarts from its seed", start_step)

    step0 = int(ts.step)
    log.info("training from step %d to %d", step0, tcfg.steps)
    profile_server = False
    if tcfg.profile_port:
        # live on-demand profiling of a running job (SURVEY.md §5 tracing):
        # point TensorBoard's profile tab / `jax.profiler.trace_remote` at
        # this port to capture device traces without restarting training
        jax.profiler.start_server(tcfg.profile_port)
        profile_server = True
        log.info("jax.profiler server listening on port %d", tcfg.profile_port)
    interrupted = False
    try:
      with mesh:
        for step_i in range(step0, tcfg.steps):
            host_batch = next(batch_iter)  # process-local numpy
            if multi_process:
                batch = global_batch(mesh, host_batch)
            else:
                batch = shard_batch(mesh, host_batch)
            dim = msched.dim_at(step_i) if msched else cfg.model.dim
            trace_ctx = (
                profile_trace(os.path.join(logdir, "profile"))
                if tcfg.profile_steps and step_i == tcfg.profile_steps
                else None
            )
            # histogram steps use the with_grads step variant (an extra
            # compiled executable that also returns the gradient tree)
            want_grads = bool(tcfg.histogram_steps) and (
                (step_i + 1) % tcfg.histogram_steps == 0
            )
            with timer:
                if trace_ctx:
                    with trace_ctx:
                        ts, m = step_fn(ts, batch, rng, dim=dim,
                                        with_grads=want_grads)
                        jax.block_until_ready(m["total"])
                else:
                    ts, m = step_fn(ts, batch, rng, dim=dim,
                                    with_grads=want_grads)
            grads = m.pop("grads", None)
            if is_primary and (step_i + 1) % tcfg.summary_steps == 0:
                m_host = {k: float(v) for k, v in jax.device_get(m).items()}
                imgs_per_sec = cfg.queue.batch_size / timer.last
                m_host["images_per_sec"] = imgs_per_sec
                m_host["dim"] = dim
                metrics_log.log(step_i + 1, m_host)
                log.info(
                    "step %d dim %d loss %.4f (coord %.3f obj %.3f noobj %.3f "
                    "cls %.3f) %.1f img/s", step_i + 1, dim, m_host["total"],
                    m_host["coord"], m_host["object"], m_host["noobject"],
                    m_host["class"], imgs_per_sec,
                )
            # Divergence guard: a NaN/inf loss means every later step is
            # garbage — halt with the state checkpointed for forensics
            # instead of silently burning the rest of the budget. Checked
            # on summary steps (a scalar fetch, no extra sync otherwise);
            # every process fetches + exits together (m is replicated).
            if tcfg.halt_on_nonfinite and (
                (step_i + 1) % tcfg.summary_steps == 0
            ):
                import math as _m

                total_val = float(jax.device_get(m["total"]))
                if not _m.isfinite(total_val):
                    # forensic save goes to a SEPARATE directory: the main
                    # restart-from-latest chain must keep pointing at the
                    # last good step, not at diverged weights (otherwise a
                    # supervised auto-restart loop trains on garbage and
                    # max_to_keep evicts every pre-divergence checkpoint)
                    log.error("non-finite loss %s at step %d; saving "
                              "diverged state for forensics and halting "
                              "(latest good checkpoint: step %s)", total_val,
                              step_i + 1, ckpt.latest_step())
                    forensic = Checkpointer(
                        os.path.join(logdir, "diverged"), max_to_keep=1)
                    forensic.save(step_i + 1, host_state(ts), force=True)
                    forensic.wait()
                    forensic.close()
                    raise SystemExit(3)
            if (is_primary or gather_all) and want_grads:
                host_params = host_state(ts.params)
                host_grads = host_state(grads)
                if is_primary:
                    metrics_log.log_histograms(step_i + 1, host_params)
                    metrics_log.log_histograms(step_i + 1, host_grads,
                                               prefix="hist/grad/")
            # In-training eval. Default: PRIMARY process only, through a
            # process-local jit (no cross-host collectives, so the other
            # processes keep dispatching train steps; params are replicated,
            # hence host-addressable from any process). With
            # eval.distributed=1, EVERY process evals its disjoint cache
            # shard on its local chips and the detections are allgathered
            # over DCN (the processes are in lockstep here anyway — they
            # would otherwise idle at the next step's collective).
            eval_dist = cfg.eval.distributed and multi_process
            if (
                (is_primary or eval_dist or gather_all)
                and tcfg.eval_steps
                and (step_i + 1) % tcfg.eval_steps == 0
            ):
                try:
                    val_cache = load_cache(cfg.cache.basedir, "val")
                except FileNotFoundError:
                    val_cache = None
                if eval_dist or gather_all:
                    # host_state / distributed eval below are COLLECTIVES
                    # entered by every process in this branch: agree on
                    # val-cache availability first, or a partially-synced
                    # filesystem deadlocks the job (some processes enter
                    # the collective, others skip).
                    from jax.experimental import multihost_utils as _mhu

                    have = _mhu.process_allgather(
                        np.asarray([val_cache is not None]))
                    if not bool(have.all()):
                        if val_cache is not None:
                            log.warning(
                                "val cache visible on this process but "
                                "missing on others; skipping eval at step "
                                "%d", step_i + 1)
                        val_cache = None
                if val_cache is not None:
                    from yolojax.eval.evaluator import evaluate_model

                    host_ts = host_state(ts)
                if val_cache is not None and (is_primary or eval_dist):
                    em = evaluate_model(
                        model, host_ts.params, host_ts.bn_state, val_cache,
                        input_dim=cfg.model.dim,
                        batch_size=cfg.eval.batch_size,
                        nms_iou=cfg.detect.nms_iou,
                        top_k=cfg.detect.top_k,
                        map_iou=cfg.eval.map_iou,
                        use_pallas=cfg.detect.use_pallas,
                        candidates=cfg.detect.candidates,
                        fuse_stem_impl=cfg.detect.fuse_stem,
                        compute_dtype=compute_dtype,
                        max_detections=cfg.eval.max_detections,
                        data_parallel=cfg.eval.data_parallel_flag(),
                        distributed=eval_dist,
                    )
                    if is_primary:
                        metrics_log.log(step_i + 1,
                                        {"map": em["map"]}, prefix="val_")
                        log.info("step %d val mAP@%.2f: %.4f", step_i + 1,
                                 cfg.eval.map_iou, em["map"])
            # Image summary from the process-local host copy of the batch
            # (works under multi-process too: no device_get of global arrays).
            if is_primary and tcfg.image_summary_steps and (
                (step_i + 1) % tcfg.image_summary_steps == 0
            ):
                imgs, boxes, _, valid = [np.asarray(t) for t in host_batch]
                metrics_log.log_image_with_boxes(
                    step_i + 1, imgs[0], boxes[0], valid[0]
                )
            # Only materialize the full state on host when the manager will
            # actually write: a per-step device_get of params+opt state is a
            # sync barrier and hundreds of MB of dead transfer otherwise.
            if ckpt.should_save(step_i + 1):
                ckpt.save(step_i + 1, host_state(ts))
                save_loader_state(step_i + 1)
    except KeyboardInterrupt:  # save before exiting (same restart contract)
        interrupted = True
        log.warning("interrupted at step %d; checkpointing", int(ts.step))
    finally:
        if profile_server:
            jax.profiler.stop_server()
    final = int(jax.device_get(ts.step))
    if ckpt.latest_step() != final:
        ckpt.save(final, host_state(ts), force=True)
        save_loader_state(final)
    ckpt.wait()
    if interrupted:
        raise SystemExit(130)
    import math as _math

    mean = timer.last if _math.isnan(timer.mean) else timer.mean
    log.info("done: %d steps, mean %.3fs/step", tcfg.steps - step0, mean)


if __name__ == "__main__":
    main()
