"""Command-line entry point, flag-compatible with the reference
(reference: codes/run.py §parse_args ≈L27-80 and §main ≈L180-360) so that
``best_config.sh`` lines translate mechanically. TPU-native extensions are
added under their own flags and default off.

Usage:
  python -m knowledgegraphembedding_tpu.cli --do_train --do_valid \
      --data_path data/FB15k-237 --model RotatE -de \
      -n 256 -b 1024 -d 1000 -g 9.0 -a 1.0 -adv -lr 0.00005 \
      --max_steps 100000 -save models/RotatE_FB15k-237_0 --test_batch_size 16
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

from .config import RunConfig


def parse_args(argv=None) -> RunConfig:
    p = argparse.ArgumentParser(
        description="Training and Testing Knowledge Graph Embedding Models (TPU-native)",
        usage="cli.py [<args>] [-h | --help]",
    )
    p.add_argument("--cuda", action="store_true",
                   help="accepted for reference compatibility; the TPU backend ignores it")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_valid", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--evaluate_train", action="store_true",
                   help="Evaluate on training data")
    p.add_argument("--countries", action="store_true",
                   help="Use Countries S1/S2/S3 datasets")
    p.add_argument("--regions", type=int, nargs="+", default=None,
                   help="Region Id for Countries S1/S2/S3 datasets, DO NOT MANUALLY SET")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--model", default="TransE", type=str)
    p.add_argument("-de", "--double_entity_embedding", action="store_true")
    p.add_argument("-dr", "--double_relation_embedding", action="store_true")
    p.add_argument("-n", "--negative_sample_size", default=128, type=int)
    p.add_argument("-d", "--hidden_dim", default=500, type=int)
    p.add_argument("-g", "--gamma", default=12.0, type=float)
    p.add_argument("-adv", "--negative_adversarial_sampling", action="store_true")
    p.add_argument("-a", "--adversarial_temperature", default=1.0, type=float)
    p.add_argument("-b", "--batch_size", default=1024, type=int)
    p.add_argument("-r", "--regularization", default=0.0, type=float)
    p.add_argument("--test_batch_size", default=4, type=int,
                   help="valid/test batch size")
    p.add_argument("--uni_weight", action="store_true",
                   help="Otherwise use subsampling weighting like word2vec")
    p.add_argument("-lr", "--learning_rate", default=0.0001, type=float)
    p.add_argument("-cpu", "--cpu_num", default=10, type=int)
    p.add_argument("-init", "--init_checkpoint", default=None, type=str)
    p.add_argument("-save", "--save_path", default=None, type=str)
    p.add_argument("--max_steps", default=100000, type=int)
    p.add_argument("--warm_up_steps", default=None, type=int)
    p.add_argument("--save_checkpoint_steps", default=10000, type=int)
    p.add_argument("--valid_steps", default=10000, type=int)
    p.add_argument("--log_steps", default=100, type=int, help="train log every xx steps")
    p.add_argument("--test_log_steps", default=1000, type=int,
                   help="valid/test log every xx steps")
    p.add_argument("--nentity", type=int, default=0,
                   help="DO NOT MANUALLY SET")
    p.add_argument("--nrelation", type=int, default=0,
                   help="DO NOT MANUALLY SET")
    # --- TPU-native extensions ---
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_chunk_size", type=int, default=4096)
    p.add_argument("--num_shards", type=int, default=1,
                   help="entity-table row shards / data-parallel degree over the device mesh")
    p.add_argument("--model_shards", type=int, default=1,
                   help=">1 adds a second mesh axis sharding the EMBEDDING "
                        "DIM of both tables (2-D (data, model) mesh, gspmd "
                        "only; must divide the table widths)")
    p.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas ranking kernel at eval (default: auto on TPU)")
    p.add_argument("--prefetch_depth", type=int, default=4)
    p.add_argument("--scoring", type=str, default="auto",
                   choices=["auto", "gather", "dense"],
                   help="negative-scoring strategy (dense = MXU matmul vs whole table)")
    p.add_argument("--precision", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="bf16 = mixed-precision compute with f32 master weights")
    p.add_argument("--sampler_backend", type=str, default="auto",
                   choices=["auto", "native", "numpy", "device"],
                   help="'device' runs the whole sampler on the TPU "
                        "(host ships only a [B] index vector per step)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the train loop here")
    p.add_argument("--eval_filter", type=str, default="auto",
                   choices=["auto", "host", "device"],
                   help="filter-mask construction at eval: host numpy vs "
                        "device-resident CSR (auto = device on TPU)")
    p.add_argument("--spmd_mode", type=str, default="gspmd",
                   choices=["gspmd", "shardmap", "routed"],
                   help="multi-chip step: GSPMD-inferred collectives, "
                        "hand-scheduled table gather (all_gather/"
                        "psum_scatter), or row-routing all_to_all exchange")
    p.add_argument("--negative_sharing", type=str, default="none",
                   choices=["none", "batch"],
                   help="'batch' shares one negative set across the batch "
                        "(PBG-style, unfiltered) — the high-throughput mode")
    p.add_argument("--async_checkpoint", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="write periodic checkpoints from a background "
                        "thread after a device-side state snapshot "
                        "(identical artifacts, zero train-loop stall); "
                        "composes with --sharded_checkpoint on fleets — "
                        "each process snapshots its local blocks and "
                        "writes them in the background")
    p.add_argument("--sharded_checkpoint", action="store_true",
                   help="mesh fleets: periodic checkpoints write each "
                        "process's local table/moment blocks to its own "
                        "checkpoint.shardNNNNN-of-NNNNN.npz (no state "
                        "gather, no fleet stall on one host's IO); resume "
                        "reassembles on any process count. The final "
                        "end-of-training save still writes the full "
                        "single-file artifacts incl. the .npy exports")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help=">1 fuses k whole train steps (device sampling + "
                        "update) into ONE compiled dispatch — removes all "
                        "per-step host work (single-chip, device-sampler "
                        "configs; blocks are clipped so log/checkpoint/"
                        "valid/LR-decay timing is unchanged). HBM note: all "
                        "k steps' batches are presampled per block, so peak "
                        "memory grows by ~2k*B*(n+4) words (k=16 headline "
                        "shape: ~34 MB; keep k <= ~64)")
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="force the JAX backend (reliable override where a "
                        "site hook pins JAX_PLATFORMS; cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "gives an N-device virtual mesh)")
    p.add_argument("--multihost", action="store_true",
                   help="bring up the jax.distributed runtime: the mesh "
                        "spans every process's devices, the triple stream "
                        "is edge-partitioned per host, process 0 writes "
                        "logs/checkpoints. On TPU pods the coordinator is "
                        "auto-detected; otherwise pass the three flags below")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    ns = p.parse_args(argv)
    return RunConfig(**vars(ns))


def planned_host_stream_bytes(batch_size: int, negative_sample_size: int,
                              negative_sharing: str,
                              steps_remaining: int) -> float:
    """Total host->device batch bytes a host-sampled train run will
    stream: i32/f32 pos [B,3] + weights [B] + mode, and negatives [B,n]
    per-positive or ONE [n] row under --negative_sharing batch. Feeds the
    r5 transfer-volume guard (the tunnel client leaks staging buffers;
    BENCH_NOTES §Round-5 leak)."""
    if negative_sharing == "batch":
        batch_bytes = 4.0 * (4 * batch_size + negative_sample_size)
    else:
        batch_bytes = 4.0 * batch_size * (negative_sample_size + 5)
    return max(steps_remaining, 0) * batch_bytes


def main(argv=None) -> dict:
    """The orchestration flow of codes/run.py §main, returning the final
    metrics dict (handy for tests)."""
    # Imports deferred so `--help` stays instant.
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: every CLI invocation is a fresh process,
    # and on a remote-dispatch TPU runtime each jit compile costs tens of
    # seconds — cache compiled executables across runs.
    from .utils import compile_cache

    compile_cache.enable()

    config = parse_args(argv)
    if config.platform != "auto":
        jax.config.update("jax_platforms", config.platform)
    if config.multihost:
        # must run before ANYTHING touches the XLA backend
        from .parallel import multihost

        multihost.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
            require=True,  # an explicit --multihost must not degrade silently
        )

    from . import checkpoint as ckpt_mod
    from . import eval as eval_mod
    from .data.filterset import FilterSets
    from .models import kge
    from .sampler import build_train_iterator
    from .train import Trainer
    from .utils.logging import log_metrics, set_logger

    # --- validation (codes/run.py §main ≈L182-190) ---
    if not (config.do_train or config.do_valid or config.do_test):
        raise ValueError("one of train/val/test mode must be chosen")
    if config.init_checkpoint:
        config = ckpt_mod.override_config(config)
    elif config.data_path is None:
        raise ValueError("one of init_checkpoint/data_path must be chosen")
    if config.do_train and config.save_path is None:
        raise ValueError("Where do you want to save your trained model?")

    set_logger(config.save_path, config.do_train)

    from . import native as native_mod

    if native_mod.available():
        native_mod.set_threads(config.cpu_num)
        logging.info(
            "native sampler: enabled (%d OpenMP threads)",
            native_mod.openmp_threads(),
        )

    # --- data (codes/run.py §main ≈L190-235) ---
    # registry: 'synthetic:<key>' generates a dataset in-process (zero-egress
    # machines); anything else is a reference-layout TSV directory
    from .data import registry

    ds = registry.load(config.data_path, countries=config.countries)
    config.nentity = ds.nentity
    config.nrelation = ds.nrelation
    if config.countries:
        config.regions = ds.regions

    # dataset fingerprint: stamped into config.json at save; compared on
    # resume so a changed dataset (synthetic generator retune, re-pointed
    # --data_path with identical vocab sizes) WARNS instead of silently
    # producing metrics against a graph the checkpoint never saw
    import json as _json
    import zlib as _zlib

    config.data_fingerprint = int(_zlib.crc32(
        np.ascontiguousarray(ds.train, dtype=np.int32).tobytes()
    ))
    if config.init_checkpoint:
        try:
            with open(os.path.join(config.init_checkpoint, "config.json")) as f:
                saved_fp = _json.load(f).get("data_fingerprint", 0)
        except (OSError, ValueError, AttributeError):
            # advisory check only — a missing or malformed config.json must
            # never block a resume (json.JSONDecodeError is a ValueError;
            # AttributeError covers valid-but-non-object JSON)
            saved_fp = 0
        if saved_fp and saved_fp != config.data_fingerprint:
            logging.warning(
                "dataset fingerprint mismatch: checkpoint trained on crc32 "
                "%08x, current data is %08x — metrics will be computed "
                "against a DIFFERENT graph", saved_fp, config.data_fingerprint,
            )

    logging.info("Model: %s", config.model)
    logging.info("Data Path: %s", config.data_path)
    logging.info("#entity: %d", ds.nentity)
    logging.info("#relation: %d", ds.nrelation)
    logging.info("#train: %d", len(ds.train))
    logging.info("#valid: %d", len(ds.valid))
    logging.info("#test: %d", len(ds.test))

    spec = config.model_spec()
    tspec = config.train_spec()
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)

    params = kge.init_params(spec, jax.random.PRNGKey(config.seed))
    # codes/run.py §main ≈L240: per-parameter configuration dump
    logging.info("Model Parameter Configuration:")
    for name, val in params.items():
        logging.info(
            "Parameter %s: %s, require_grad = True", name, tuple(val.shape)
        )
    warm_up = config.warm_up_steps if config.warm_up_steps else config.max_steps // 2
    if config.num_shards < 1 or config.model_shards < 1:
        raise ValueError(
            f"--num_shards {config.num_shards} / --model_shards "
            f"{config.model_shards}: both must be >= 1"
        )
    if config.multihost and jax.process_count() > 1:
        if jax.device_count() % config.model_shards != 0:
            raise ValueError(
                f"--model_shards {config.model_shards} must divide the "
                f"fleet device count ({jax.device_count()})"
            )
        if config.num_shards == 1:
            # span the whole fleet: data axis = devices / model columns
            config.num_shards = jax.device_count() // config.model_shards
        if config.num_shards * config.model_shards != jax.device_count():
            # a partial mesh would exclude some hosts' devices — those hosts
            # would then join collectives on a mesh they are not part of
            raise ValueError(
                f"--num_shards {config.num_shards} x --model_shards "
                f"{config.model_shards} != fleet device count "
                f"{jax.device_count()}: multihost meshes must span every "
                "process's devices"
            )
    mesh = None
    if config.num_shards > 1 or config.model_shards > 1:
        from .parallel import sharding as sharding_mod

        if config.model_shards > 1 and config.multihost:
            # each host's devices must fill WHOLE data-rows of the
            # (data, model) mesh so its batch shard maps onto its devices
            if jax.local_device_count() % config.model_shards != 0:
                raise ValueError(
                    f"--model_shards {config.model_shards} must divide the "
                    f"local device count ({jax.local_device_count()}) on a "
                    "multihost fleet (each host owns whole data-rows)"
                )
        mesh = sharding_mod.build_mesh(
            config.num_shards, model_shards=config.model_shards
        )
        if config.model_shards > 1:
            logging.info(
                "SPMD mesh: (%d data x %d model) devices",
                config.num_shards, config.model_shards,
            )
        else:
            logging.info(
                "SPMD mesh: %d devices on axis 'data'", config.num_shards
            )
        if config.multihost:
            logging.info(
                "multihost: process %d/%d, %d local devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(),
            )
        if config.do_train and config.steps_per_dispatch > 1:
            from .fused_train import FusedMeshTrainer

            if config.model_shards > 1:
                raise ValueError(
                    "--steps_per_dispatch > 1 is written for the 1-D row "
                    "shard; use per-step training with --model_shards"
                )
            if config.spmd_mode == "routed":
                raise ValueError(
                    "--steps_per_dispatch > 1 on a mesh fuses the "
                    "hand-scheduled table-gather step; the routed "
                    "all_to_all schedule has no fused variant — use "
                    "--spmd_mode shardmap/gspmd or per-step training"
                )
            if config.spmd_mode == "gspmd":
                # fused mesh blocks always run the explicit
                # all_gather/psum_scatter schedule — numerically equal to
                # gspmd (trajectory parity pinned by tests/test_shard_map.py
                # and test_cli.py::test_sharded_cli_flow)
                logging.info(
                    "fused mesh blocks use the hand-scheduled collective "
                    "schedule (equivalent to gspmd; parity-pinned)"
                )
            if config.sampler_backend not in ("auto", "device"):
                raise ValueError(
                    "--steps_per_dispatch > 1 fuses the DEVICE sampler into "
                    "the train program; --sampler_backend "
                    f"{config.sampler_backend} cannot feed a fused block"
                )
            trainer = FusedMeshTrainer(
                spec, tspec, params, lr=config.learning_rate,
                warm_up_steps=warm_up, train=ds.train, mesh=mesh,
                seed=config.seed, negative_sharing=config.negative_sharing,
            )
            logging.info(
                "fused training: %d steps per dispatch on the %d-device mesh",
                config.steps_per_dispatch, config.num_shards,
            )
        else:
            trainer = sharding_mod.ShardedTrainer(
                spec, tspec, params, lr=config.learning_rate,
                warm_up_steps=warm_up, mesh=mesh,
                shared_negatives=config.negative_sharing == "batch",
                spmd_mode=config.spmd_mode,
            )
    elif config.do_train and config.steps_per_dispatch > 1:
        from .fused_train import FusedDeviceTrainer

        if config.sampler_backend not in ("auto", "device"):
            raise ValueError(
                "--steps_per_dispatch > 1 fuses the DEVICE sampler into the "
                f"train program; --sampler_backend {config.sampler_backend} "
                "cannot feed a fused block"
            )
        if (config.negative_sharing != "batch"
                and ds.nentity * ds.nrelation >= 2**31):
            # same bound as DeviceSampler itself (int32 composite keys) —
            # pre-checked here for a flag-level message
            raise ValueError(
                "--steps_per_dispatch > 1 needs the device rejection CSR, "
                f"whose composite key space E*R = {ds.nentity * ds.nrelation} "
                "exceeds int32; use the per-step host sampler"
            )
        trainer = FusedDeviceTrainer(
            spec, tspec, params, lr=config.learning_rate,
            warm_up_steps=warm_up, train=ds.train, seed=config.seed,
            negative_sharing=config.negative_sharing,
        )
        logging.info(
            "fused training: %d steps per dispatch", config.steps_per_dispatch
        )
    else:
        trainer = Trainer(spec, tspec, params, lr=config.learning_rate,
                          warm_up_steps=warm_up)

    if config.init_checkpoint:
        logging.info("Loading checkpoint %s...", config.init_checkpoint)
        if mesh is not None:
            from .parallel import multihost

            if ckpt_mod.is_sharded_checkpoint(config.init_checkpoint):
                # process-local: each host reads only the blocks its own
                # device shards need (no full-table host copy anywhere)
                ckpt_mod.restore_trainer_sharded(trainer, config.init_checkpoint)
                step0, lr0, wu0 = (trainer.step, trainer.current_learning_rate,
                                   trainer.warm_up_steps)
            else:
                p0, s0, step0, lr0, wu0 = ckpt_mod.load_checkpoint(
                    config.init_checkpoint)
                trainer.load_host_state(p0, s0, step0, lr0, wu0)
            multihost.verify_consistent_restore(step0, lr0, wu0)
        else:
            ckpt_mod.restore_trainer(trainer, config.init_checkpoint)
    else:
        logging.info("Randomly Initializing %s Model...", config.model)

    step = trainer.step
    logging.info("Start Training...")
    logging.info("init_step = %d", step)
    logging.info("batch_size = %d", config.batch_size)
    logging.info(
        "negative_adversarial_sampling = %s", config.negative_adversarial_sampling
    )
    logging.info("hidden_dim = %d", config.hidden_dim)
    logging.info("gamma = %f", config.gamma)
    if config.negative_adversarial_sampling:
        logging.info("adversarial_temperature = %f", config.adversarial_temperature)

    final_metrics = {}

    if config.do_train and config.steps_per_dispatch > 1:
        logging.info("learning_rate = %f", trainer.current_learning_rate)
        _run_fused_training(trainer, config, ds, filters, eval_mod, ckpt_mod)
        _periodic_save(ckpt_mod, trainer, config, final=True)
        ckpt_mod.wait_for_pending_save()
    elif config.do_train:
        logging.info("learning_rate = %f", trainer.current_learning_rate)
        sampler_backend = config.sampler_backend
        if (sampler_backend == "auto" and mesh is None
                and jax.default_backend() == "tpu"):
            # Measured policy (BENCH_NOTES.md): the on-device sampler wins
            # whenever the host pipeline is the bottleneck — always for the
            # fast device steps (dense MXU scoring, shared negatives), and
            # for gather configs whenever one host batch costs more than
            # the ~25 ms gather-step floor (large n / big train sets on
            # weak hosts: measured 8.0k -> 14.4k triples/s at YAGO scale).
            # Decide by measuring one real host batch.
            from .data.filterset import MAX_DENSE_KEYS
            from .train import use_dense_scoring

            # Transfer-volume guard (r5): the axon tunnel client leaks
            # every transferred host staging buffer — device_put and
            # jit-argument paths, any thread, Array.delete()/gc all
            # equivalent (measured ~2 MB/step -> 130 GB anon-RSS at step
            # 63k of the wn18rr capstone -> kernel OOM kill). When the
            # planned run would stream a large fraction of host RAM as
            # batches, the 4 KB/step device sampler is the robust choice
            # regardless of per-batch latency.
            est_stream = planned_host_stream_bytes(
                config.batch_size, config.negative_sample_size,
                config.negative_sharing, config.max_steps - step)
            ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            tunnel = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
            if ds.nentity * ds.nrelation <= MAX_DENSE_KEYS:
                if tunnel and est_stream > 0.4 * ram:
                    sampler_backend = "device"
                    logging.info(
                        "sampler backend: device (auto — planned host "
                        "batch stream %.0f GB exceeds 40%% of host RAM "
                        "%.0f GB; the tunnel client leaks transferred "
                        "staging buffers)", est_stream / 1e9, ram / 1e9)
                elif (use_dense_scoring(spec, tspec)
                        or config.negative_sharing == "batch"):
                    sampler_backend = "device"
                    logging.info("sampler backend: device (auto)")
                else:
                    from .sampler.negative import TAIL_BATCH, TrainSampler

                    probe = TrainSampler(
                        ds.train, ds.nentity, ds.nrelation,
                        config.batch_size, config.negative_sample_size,
                        TAIL_BATCH, filters, seed=config.seed,
                    )
                    probe.next_batch()  # warm caches
                    # Median of 3 timed batches: a single sample is noisy on
                    # a contended host (the exact scenario that motivates the
                    # device sampler — one stall would flip the decision the
                    # wrong way; VERDICT r2 weak #4). ~75 ms total, once.
                    samples_ms = []
                    for _ in range(3):
                        t0 = time.time()
                        probe.next_batch()
                        samples_ms.append((time.time() - t0) * 1e3)
                    host_ms = sorted(samples_ms)[1]
                    logging.info(
                        "sampler auto-probe: host batches %.1f/%.1f/%.1f ms "
                        "(median %.1f, threshold 25.0)",
                        *sorted(samples_ms), host_ms,
                    )
                    if host_ms > 25.0:
                        sampler_backend = "device"
                        logging.info(
                            "sampler backend: device (auto — host sampling "
                            "measured %.1f ms/batch)", host_ms,
                        )
                    else:
                        logging.info(
                            "sampler backend: host (auto — %.1f ms/batch "
                            "under the 25 ms gather-step floor)", host_ms,
                        )
            elif tunnel and est_stream > 0.4 * ram:
                logging.warning(
                    "planned host batch stream %.0f GB exceeds 40%% of "
                    "host RAM %.0f GB and the tunnel client leaks "
                    "transferred staging buffers, but the device sampler "
                    "is unavailable at this E*R; consider "
                    "--steps_per_dispatch > 1 (device-side sampling) or "
                    "splitting the run across resumes",
                    est_stream / 1e9, ram / 1e9)
        # multihost: each host's epoch permutation covers ITS edge-
        # partitioned shard of the train rows, at the local batch size;
        # filter sets and subsampling weights stay computed over the FULL
        # train set (reference semantics). Seeds differ per host so shards
        # draw independent negatives.
        index_subset = None
        stream_batch = config.batch_size
        stream_seed = config.seed
        if config.multihost and jax.process_count() > 1:
            from .parallel import multihost

            index_subset = multihost.host_shard_of_indices(len(ds.train))
            stream_batch = multihost.host_batch_size(config.batch_size)
            stream_seed = config.seed + 7919 * jax.process_index()
        # a [1, n] shared-negative batch is REPLICATED on the mesh: under
        # multihost every host must draw the identical set or GSPMD's
        # replication assumption is violated — seed that stream
        # host-independently
        shared_negative_seed = (
            config.seed + 10_000_019
            if (config.negative_sharing == "batch" and index_subset is not None)
            else None
        )
        mesh_device_stream = (
            sampler_backend == "device" and mesh is not None
        )
        if mesh_device_stream and "model" in mesh.axis_names:
            raise ValueError(
                "--sampler_backend device is written for the 1-D row-shard "
                "mesh; use a host sampler backend with --model_shards"
            )
        if mesh_device_stream:
            # mesh-wide SPMD sampler: each device draws its own shard of
            # the global batch on-device; hosts ship only [B/P] index rows
            # per step and the train step consumes the emitted GLOBAL
            # arrays with zero host-side assembly (works single- and
            # multi-host — the r1 host-path bypass is gone)
            from .sampler.device_sampler import build_mesh_device_iterator

            it = build_mesh_device_iterator(
                mesh, ds.train, ds.nentity, ds.nrelation,
                config.batch_size, config.negative_sample_size,
                seed=config.seed, negative_sharing=config.negative_sharing,
                depth=max(1, config.prefetch_depth // 2),
                index_subset=index_subset,
            )
        else:
            it = build_train_iterator(
                ds.train, ds.nentity, ds.nrelation,
                stream_batch, config.negative_sample_size, filters,
                seed=stream_seed, prefetch_depth=config.prefetch_depth,
                backend=sampler_backend,
                negative_sharing=config.negative_sharing,
                index_subset=index_subset,
                shared_negative_seed=shared_negative_seed,
                # single-device trainers take device arrays: uploading from
                # the prefetch thread overlaps batch i+1's host->device
                # transfer with step i's device compute (mesh trainers
                # assemble global batches from host arrays — keep False)
                device_put=(mesh is None),
            )
        from .utils.profiling import trace as profiler_trace

        # Per-step logs stay ON DEVICE, folded into one accumulator array by
        # a single jitted add per step; each log window costs exactly ONE
        # device->host pull. (Pulling every step's scalars at window end was
        # measured at ~26 ms of transfer latency per scalar on the
        # remote-tunnel TPU — it froze fast configs at <10k triples/s.)
        log_keys: list = []
        log_acc = None
        acc_fn = jax.jit(lambda acc, vals: acc + jnp.stack(vals))
        # Routed-mode corruption window: overflow is detected in-step on the
        # device (parallel/routed_step.py), but reading the flag syncs the
        # pipeline (~26 ms on a remote runtime) — poll it every few steps
        # instead of only at the log window, bounding corrupted updates to
        # <= overflow_every steps before abort (checkpoint writes are gated
        # separately below, so nothing corrupt ever persists).
        overflow_every = (
            min(config.log_steps, 25)
            if config.spmd_mode == "routed" and config.num_shards > 1
            else 0
        )
        t_last = time.time()
        n_since = 0
        profile_ctx = profiler_trace(config.profile_dir)
        profile_ctx.__enter__()
        # single-device Trainer wants device arrays (one H2D per tensor);
        # the mesh trainers assemble the global batch themselves from HOST
        # arrays — uploading here would force a device->host->device round
        # trip per step (~26 ms per pull on a remote runtime). Mesh-device-
        # sampled batches are already global device arrays: pass through
        # untouched (np.asarray on a non-fully-addressable array raises).
        if mesh is None:
            cast = jnp.asarray
        elif mesh_device_stream:
            cast = lambda x: x  # noqa: E731
        else:
            cast = np.asarray
        for step in range(trainer.step, config.max_steps):
            pos, neg, w, mode = next(it)
            logs = trainer.one_step((cast(pos), cast(neg), cast(w), mode))
            if log_acc is None:
                log_keys = sorted(logs)
                # numpy (uncommitted) seed value: on a multihost fleet the
                # step's logs are global replicated arrays and a committed
                # local zeros array could not join their jit
                log_acc = np.zeros(len(log_keys), np.float32)
            log_acc = acc_fn(log_acc, [logs[k] for k in log_keys])
            n_since += 1

            if (
                overflow_every
                and (step + 1) % overflow_every == 0
                and "routed_overflow" in log_keys
                and float(np.asarray(log_acc)[log_keys.index("routed_overflow")]) > 0
            ):
                raise RuntimeError(
                    "routed exchange bucket overflow detected — "
                    "capacity exceeded; use --spmd_mode shardmap"
                )

            if (step + 1) % config.save_checkpoint_steps == 0:
                # never persist a routed-overflow-corrupted state: check the
                # accumulated overflow flag BEFORE writing (one scalar pull
                # per save; a resume from a corrupt checkpoint would be
                # silent forever)
                if log_acc is not None and "routed_overflow" in log_keys:
                    acc_now = np.asarray(log_acc)
                    if acc_now[log_keys.index("routed_overflow")] > 0:
                        raise RuntimeError(
                            "routed exchange bucket overflow detected before "
                            "checkpoint save — aborting without persisting "
                            "corrupted state; use --spmd_mode shardmap"
                        )
                _periodic_save(ckpt_mod, trainer, config)

            if (step + 1) % config.log_steps == 0:
                # surface an async-writer failure within one log interval,
                # not a full checkpoint interval later
                ckpt_mod.check_pending_save()
                sums = np.asarray(log_acc)  # the one device sync per window
                metrics = {k: float(s) / n_since for k, s in zip(log_keys, sums)}
                dt = time.time() - t_last
                metrics["triples_per_sec"] = n_since * config.batch_size / dt
                log_metrics("Training average", step, metrics)
                if metrics.get("routed_overflow", 0.0) > 0.0:
                    # silent truncation in the all_to_all exchange corrupts
                    # training (parallel/routed_step.py capacity docs)
                    raise RuntimeError(
                        "routed exchange bucket overflow detected — "
                        "capacity exceeded; use --spmd_mode shardmap"
                    )
                log_acc = np.zeros(len(log_keys), np.float32)
                t_last = time.time()
                n_since = 0

            if config.do_valid and (step + 1) % config.valid_steps == 0:
                logging.info("Evaluating on Valid Dataset...")
                metrics = _evaluate(
                    trainer, spec, config, ds.valid, ds, filters, eval_mod, mesh
                )
                log_metrics("Valid", step, metrics)

        profile_ctx.__exit__(None, None, None)
        it.close()
        _periodic_save(ckpt_mod, trainer, config, final=True)
        ckpt_mod.wait_for_pending_save()

    if config.do_valid:
        logging.info("Evaluating on Valid Dataset...")
        metrics = _evaluate(trainer, spec, config, ds.valid, ds, filters, eval_mod, mesh)
        log_metrics("Valid", trainer.step, metrics)
        final_metrics["valid"] = metrics

    if config.do_test:
        logging.info("Evaluating on Test Dataset...")
        metrics = _evaluate(trainer, spec, config, ds.test, ds, filters, eval_mod, mesh)
        log_metrics("Test", trainer.step, metrics)
        final_metrics["test"] = metrics

    if config.evaluate_train:
        logging.info("Evaluating on Training Dataset...")
        metrics = _evaluate(trainer, spec, config, ds.train, ds, filters, eval_mod, mesh)
        log_metrics("Test", trainer.step, metrics)
        final_metrics["train"] = metrics

    return final_metrics


def _run_fused_training(trainer, config, ds, filters, eval_mod, ckpt_mod):
    """Block-mode train loop (--steps_per_dispatch > 1): k fused steps per
    dispatch, with blocks clipped to every log/checkpoint/valid boundary and
    the warm-up decay step, so event timing and the LR schedule are
    IDENTICAL to the per-step loop (codes/run.py §main ≈L280-340)."""
    import jax
    import jax.numpy as jnp

    from .utils.logging import log_metrics
    from .utils.profiling import trace as profiler_trace

    def to_boundary(step, period):
        return period - step % period

    log_keys: list = []
    log_acc = None
    acc_fn = jax.jit(lambda acc, vals: acc + jnp.stack(vals))
    t_last = time.time()
    n_since = 0
    ctx = profiler_trace(config.profile_dir)
    ctx.__enter__()
    while trainer.step < config.max_steps:
        step0 = trainer.step
        k = min(config.steps_per_dispatch, config.max_steps - step0,
                to_boundary(step0, config.log_steps),
                to_boundary(step0, config.save_checkpoint_steps))
        if config.do_valid:
            k = min(k, to_boundary(step0, config.valid_steps))
        k = trainer.max_block(k)
        logs = trainer.run_block(k)  # logs are SUMS over the k steps
        if log_acc is None:
            log_keys = sorted(logs)
            log_acc = np.zeros(len(log_keys), np.float32)
        log_acc = acc_fn(log_acc, [logs[kk] for kk in log_keys])
        n_since += k

        step = trainer.step - 1  # last completed step
        if (step + 1) % config.save_checkpoint_steps == 0:
            _periodic_save(ckpt_mod, trainer, config)
        if (step + 1) % config.log_steps == 0:
            ckpt_mod.check_pending_save()  # async-writer failure → abort now
            sums = np.asarray(log_acc)  # the one device sync per window
            metrics = {kk: float(s) / n_since for kk, s in zip(log_keys, sums)}
            dt = time.time() - t_last
            metrics["triples_per_sec"] = n_since * config.batch_size / dt
            log_metrics("Training average", step, metrics)
            log_acc = np.zeros(len(log_keys), np.float32)
            t_last = time.time()
            n_since = 0
        if config.do_valid and (step + 1) % config.valid_steps == 0:
            logging.info("Evaluating on Valid Dataset...")
            metrics = _evaluate(
                trainer, trainer.spec, config, ds.valid, ds, filters,
                eval_mod, getattr(trainer, "mesh", None),
            )
            log_metrics("Valid", step, metrics)
    ctx.__exit__(None, None, None)


def _periodic_save(ckpt_mod, trainer, config, final: bool = False) -> None:
    """Checkpoint dispatch: per-process shard files on mesh fleets when
    --sharded_checkpoint (no state gather, no fleet stall — SURVEY §5.4),
    else the reference-layout full save. Periodic saves are async by
    default on both paths (--async_checkpoint: device snapshot + background
    writer; the sharded save has no collective, so async composes on
    fleets too); the final save is always synchronous. In sharded mode even
    the final save stays shard-per-process — the .npy serving exports are
    produced from the shard files by tools/export_tables.py instead of a
    fleet-stalling gather."""
    if config.sharded_checkpoint and getattr(trainer, "mesh", None) is not None:
        ckpt_mod.save_model_sharded(
            trainer, config, config.save_path,
            asynchronous=config.async_checkpoint and not final)
    else:
        ckpt_mod.save_model(trainer, config, config.save_path,
                            asynchronous=config.async_checkpoint and not final)


def _evaluate(trainer, spec, config, triples, ds, filters, eval_mod, mesh=None) -> dict:
    """Dispatch: countries AUC-PR vs filtered link prediction
    (codes/model.py §test_step's two branches); candidate-axis-sharded
    ranking when training on a mesh."""
    device_filter = {"auto": None, "host": False, "device": True}[
        config.eval_filter
    ]
    if config.countries:
        params = trainer.host_params() if mesh is not None else trainer.params
        auc = eval_mod.countries_auc_pr(params, spec, triples, config.regions)
        return {"auc_pr": auc}
    if mesh is not None:
        # 1-D: shard_map beat-counting over table rows. 2-D: the dense
        # GSPMD body (eval_sharded._ranks_body) — evaluation runs in place
        # on the training placement either way; the r2 host-gather
        # fallback for model-sharded meshes is gone.
        from .parallel import eval_sharded

        return eval_sharded.sharded_test_step(
            trainer.params, spec, triples, filters, mesh,
            test_batch_size=config.test_batch_size,
            device_filter=device_filter,
        )
    return eval_mod.test_step(
        trainer.params, spec, triples, filters,
        test_batch_size=config.test_batch_size,
        eval_chunk_size=config.eval_chunk_size,
        test_log_steps=config.test_log_steps,
        logger=logging.getLogger(),
        use_pallas=config.use_pallas,
        device_filter=device_filter,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
