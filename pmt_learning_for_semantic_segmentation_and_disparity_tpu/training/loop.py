"""Session orchestrator — the runNetwork equivalent
(torch_implementation.py:621-964), SPMD edition.

One process drives the whole mesh: build mesh -> datasets -> model ->
optimizer -> restore -> epochs of sharded train steps with periodic eval +
checkpointing. No process groups, samplers or barriers survive the
translation (SURVEY.md §2.5).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from ..core.config import PMTConfig
from ..data.datasets import build_datasets, normalization_for
from ..data.pipeline import DataLoader, prefetch_to_mesh
from ..metrics.segmetrics import mean_iou, pixel_accuracy
from ..models import get_network
from ..parallel.mesh import DATA_AXIS, make_mesh, mesh_size, replicate
from .checkpoint import CheckpointManager
from .optim import build_optimizer
from .state import TrainState
from .step import make_eval_step, make_train_step


def _import_torch_checkpoint(cfg: PMTConfig, path: str):
    """Torch .pth(.tar) -> {params, batch_stats} for the nets with full
    importers (utils/torch_import.py)."""
    from ..utils.torch_import import (
        import_dsnetv2,
        import_minidsnet_ext,
        load_torch_state_dict,
    )

    from ..utils.torch_import_families import (
        import_ext_small,
        import_minidsnet_divide,
        import_psmnet,
        import_sppnet_mono,
        import_sppnet_stereo,
    )

    sd = load_torch_state_dict(path)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    net = cfg.model.net
    if net in ("sdnet_mini_ext", "sdnet_mini_ext_v2",
               "sdnet_mini_ext_piramid", "sdnet_mini_ext_piramid_res"):
        variant = {"sdnet_mini_ext": "ext", "sdnet_mini_ext_v2": "v2",
                   "sdnet_mini_ext_piramid": "piramid",
                   "sdnet_mini_ext_piramid_res": "piramid_res"}[net]
        params, stats = import_minidsnet_ext(
            sd, labels=cfg.data.n_labels, use_att=cfg.model.use_att,
            conv_deconv_out=cfg.model.conv_deconv_out,
            ablation=cfg.model.ablation, aspp_mod=cfg.model.aspp,
            hanet=bool(cfg.model.hanet), variant=variant,
        )
    elif net == "sdnetv2":
        params, stats = import_dsnetv2(sd, labels=cfg.data.n_labels)
    elif net == "sdnet":
        from ..utils.torch_import import import_dsnet

        params, stats = import_dsnet(sd, labels=cfg.data.n_labels)
    elif net == "sdnet_mini":
        from ..utils.torch_import import import_minidsnet

        params, stats = import_minidsnet(sd, labels=cfg.data.n_labels)
    elif net == "sdnet_seg":
        from ..utils.torch_import import import_seg_dsnet

        params, stats = import_seg_dsnet(sd, labels=cfg.data.n_labels)
    elif net == "deeplab":
        params, stats = import_sppnet_mono(sd)
    elif net == "deeplab_mod":
        params, stats = import_sppnet_stereo(sd)
    elif net == "pspnet":
        params, stats = import_psmnet(sd)
    elif net in ("sdnet_mini_ext_small", "sdnet_mini_ext_small_edge",
                 "sdnet_mini_ext_small_edgev2"):
        variant = {"sdnet_mini_ext_small": "v0",
                   "sdnet_mini_ext_small_edge": "edge",
                   "sdnet_mini_ext_small_edgev2": "v2"}[net]
        params, stats = import_ext_small(sd, variant=variant)
    elif net == "sdnet_mini_ext_dlab":
        from ..utils.torch_import_families import import_ext_dlab

        params, stats = import_ext_dlab(
            sd, labels=cfg.data.n_labels,
            conv_deconv_out=cfg.model.conv_deconv_out,
            ablation=cfg.model.ablation, hanet=bool(cfg.model.hanet))
    elif net in ("dsnet_warp", "dsnet_warp_soft", "dsnet_warp_disp",
                 "dsnet_warp_disp_consist"):
        variant = {"dsnet_warp": "divide", "dsnet_warp_soft": "soft",
                   "dsnet_warp_disp": "disp",
                   "dsnet_warp_disp_consist": "disp2"}[net]
        params, stats = import_minidsnet_divide(sd, variant=variant)
    else:
        raise NotImplementedError(
            f"torch-checkpoint import not wired for -net {net}")
    import jax.numpy as jnp

    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


class Session:
    def __init__(self, cfg: PMTConfig, mesh=None, use_mesh: bool = True):
        cfg.validate()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else (
            make_mesh() if use_mesh else None
        )
        axis = DATA_AXIS if (
            self.mesh is not None and cfg.parallel.sync_batchnorm
        ) else None
        self.model = get_network(cfg, axis_name=axis)
        self.tx = None
        self.state = None
        self._train_step = None
        self._eval_step = None

    # -- init ---------------------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray],
                   steps_per_epoch: int = 1) -> TrainState:
        cfg = self.cfg
        import jax.numpy as jnp

        left = jnp.asarray(sample_batch["left"][:1])
        kwargs = {}
        if cfg.model.output_type == "multitask":
            kwargs = dict(
                disp_gt=jnp.asarray(sample_batch["disp"][:1]),
                seg_labels=jnp.argmax(jnp.asarray(sample_batch["seg"][:1]), -1),
            )
        if cfg.model.hanet:
            from ..models.hanet import build_pos_grid

            kwargs["pos"] = build_pos_grid(left.shape[1], left.shape[2])
        if cfg.model.edges:
            left = jnp.concatenate(
                [left, jnp.asarray(sample_batch["edges"][:1])], axis=-1
            )
        # jitted init: ONE compiled program instead of one tiny backend
        # compile per initializer (eager flax init). Over the axon TPU
        # relay the eager path costs a full tunnel round-trip per param —
        # ~400 RPCs for densenet121 (minutes); jitted it is one compile.
        variables = jax.jit(
            lambda rngs, l, kw: self.model.init(rngs, l, l, train=False,
                                                **kw)
        )(
            {"params": jax.random.PRNGKey(cfg.run.seed),
             "dropout": jax.random.PRNGKey(1)},
            left, kwargs,
        )
        if cfg.model.pretrained_path:
            # pretrained backbone import — the reference's torch-hub
            # pretrained=True default (models/densenet.py:248-258,
            # models_deeplab/xception.py load_url, models/mobilenetv3.py:
            # 219-230) with a local checkpoint instead of a download
            from ..utils.torch_import import (
                apply_backbone_params,
                import_densenet121,
                load_torch_state_dict,
                ref_densenet_to_torchvision_keys,
            )
            from ..utils.torch_import_families import (
                import_mobilenetv3_backbone,
                import_xception65_backbone,
            )

            sd = load_torch_state_dict(cfg.model.pretrained_path)
            if cfg.model.net in ("deeplab", "deeplab_mod"):
                # xception65 encoder lives at params["encoder"]
                bp, bs = import_xception65_backbone(sd)
                variables = apply_backbone_params(
                    dict(variables), bp, bs, path=("encoder",))
            elif cfg.model.backbone == "mobilenet":
                bp, bs = import_mobilenetv3_backbone(sd)
                variables = apply_backbone_params(dict(variables), bp, bs)
            elif cfg.model.backbone == "densenet":
                if "features.conv0.weight" not in sd:
                    sd = ref_densenet_to_torchvision_keys(sd)
                bp, bs = import_densenet121(sd)
                variables = apply_backbone_params(dict(variables), bp, bs)
            else:
                raise NotImplementedError(
                    "-pretrained_path import is wired for densenet121, "
                    "mobilenetv3-large and xception65 (deeplab nets)")
        self.tx = build_optimizer(
            cfg.optim, cfg.model.net, len(cfg.loss.losses), steps_per_epoch
        )
        state = TrainState.create(
            self.model.apply, variables["params"],
            variables.get("batch_stats", {}), self.tx,
        )
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        self.state = state
        self._train_step = make_train_step(cfg, self.model, self.mesh)
        self._eval_step = make_eval_step(cfg, self.model, self.mesh)
        return state

    # -- epochs ------------------------------------------------------------
    def train_epoch(self, loader: DataLoader, epoch: int, log=print):
        cfg = self.cfg
        loader.set_epoch(epoch)
        rng = jax.random.PRNGKey(cfg.run.seed * 131071 + epoch)
        t0 = time.time()
        last = {}
        it = (
            prefetch_to_mesh(loader, self.mesh)
            if self.mesh is not None
            else (
                (b, {"meta": b.pop("meta", None), "valid": b.pop("valid", None)})
                for b in map(dict, loader)
            )
        )
        for i, (batch, _) in enumerate(it):
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._train_step(self.state, batch, sub)
            last = metrics
            if i % cfg.run.log_every == 0:
                loss = float(metrics["loss"])
                log(
                    f"[{epoch + 1}, {i + 1:5d} / {len(loader)}] "
                    f"loss: {loss:.3f} "
                    f"PixelAcc: {float(metrics['pixel_acc2']):.3f} "
                    f"({time.time() - t0:.1f}s)"
                )
        return {k: np.asarray(v) for k, v in last.items()}

    def evaluate(self, loader: DataLoader, log=print,
                 show_per_step: bool = False,
                 artifacts_dir: Optional[str] = None) -> Dict[str, float]:
        """test_model equivalent: per-step tabulate tables when
        show_per_step (torch_implementation.py:512-566), final mean±std, and
        optional artifact dumps (prediction jpgs + confusion heatmaps)."""
        from ..evaluation.evaluator import (
            MetricAccumulator,
            dump_prediction_images,
            save_confusion_matrix_png,
        )

        acc = MetricAccumulator()
        rng = jax.random.PRNGKey(0)
        it = (
            prefetch_to_mesh(loader, self.mesh)
            if self.mesh is not None
            else (
                (b, {"meta": b.pop("meta", None), "valid": b.pop("valid", None)})
                for b in map(dict, loader)
            )
        )
        img = 0
        for i, (batch, extras) in enumerate(it):
            out, m = self._eval_step(
                self.state.params, self.state.batch_stats, batch, rng
            )
            # the eval step returns PER-ROW metrics (leading dim = batch);
            # keep only the `valid` rows — padded tail rows (pipeline.py
            # pad_batch) never reach the report. Each row is one reference
            # eval step (test_model runs batch=1).
            m = {k: np.asarray(v) for k, v in m.items()}
            n_rows = next(iter(m.values())).shape[0]
            valid = extras.get("valid")
            if valid is None:  # explicit: valid=0 must NOT fall back
                valid = n_rows
            for r in range(min(valid, n_rows)):
                row = acc.update({k: v[r] for k, v in m.items()})
                if show_per_step:
                    log(acc.table(step_row=row))
                if artifacts_dir is not None:
                    dump_prediction_images(
                        artifacts_dir, img,
                        np.asarray(out["seg2"][r:r + 1]),
                        np.asarray(batch["seg"][r:r + 1]),
                        np.asarray(out["disp1"][r:r + 1]),
                        np.asarray(batch["disp"][r:r + 1]),
                    )
                img += 1
        summary = acc.summary(class_names=self.cfg.data.class_names)
        if artifacts_dir is not None and acc.conf2 is not None:
            save_confusion_matrix_png(
                acc.conf2, self.cfg.data.class_names,
                f"{artifacts_dir}/confusion_head2.png",
            )
            save_confusion_matrix_png(
                acc.conf1, self.cfg.data.class_names,
                f"{artifacts_dir}/confusion_head1.png",
            )
        out = {}
        for k, v in summary.items():
            if k in ("pixel_acc_cm", "pixel_acc_class"):
                out["pixel_acc_cm2" if k == "pixel_acc_cm" else k] = v
            else:
                out[k] = v
        log(acc.final_table())
        return out

    # -- full run ------------------------------------------------------------
    def fit(self, log=print):
        cfg = self.cfg
        norm = normalization_for(cfg.model.backbone, cfg.model.net)
        trainset, testset = build_datasets(
            cfg.data, cfg.model.output_activation, cfg.model.max_disp, norm,
            train=cfg.run.train,
        )
        # multi-host: every host loads only its slice of the global batch
        pi, pc = jax.process_index(), jax.process_count()
        train_loader = DataLoader(
            trainset, cfg.run.batch, shuffle=True,
            num_workers=cfg.data.num_workers, seed=cfg.run.seed,
            process_index=pi, process_count=pc,
        )
        n_dev = mesh_size(self.mesh) if self.mesh is not None else 1
        if cfg.run.batch % n_dev:
            raise ValueError(
                f"-b {cfg.run.batch} must be divisible by the mesh's "
                f"{n_dev} devices (the global batch shards over the 'data' "
                f"axis; the reference's DataParallel analogue multiplies "
                f"batch by device count, torch_implementation.py:661-664)"
            )
        if len(trainset) < cfg.run.batch:
            raise ValueError(
                f"training set has {len(trainset)} samples < batch "
                f"{cfg.run.batch} (drop_last leaves zero batches)"
            )
        eval_batch = max(n_dev, (min(cfg.run.batch, max(1, len(testset)))
                                 // n_dev) * n_dev)
        test_loader = DataLoader(
            testset, eval_batch, shuffle=False,
            num_workers=cfg.data.num_workers, drop_last=False,
            bucket_hw=cfg.data.eval_shape, pad_batch=True,
            process_index=pi, process_count=pc,
        )
        first = next(iter(train_loader))
        self.init_state(first, steps_per_epoch=len(train_loader))
        ckpt = CheckpointManager(f"{cfg.run.save_path}/{cfg.model_id()}")
        start_epoch, history = 0, []
        if cfg.run.load_weights:
            start_epoch, history = self.restore(cfg.run.load_weights)
            log(f"restored checkpoint; resuming at epoch {start_epoch}")
        for epoch in range(start_epoch, cfg.run.epochs):
            self.train_epoch(train_loader, epoch, log=log)
            if (epoch + 1) % cfg.run.eval_every == 0 or epoch == cfg.run.epochs - 1:
                ev = self.evaluate(test_loader, log=log)
                history.append(ev)
                ckpt.save(
                    epoch, self.state,
                    extra={"epoch": epoch, "eval": ev, "history": history,
                           "config": cfg.to_json()},
                    val_iou=ev.get("miou2", -1.0),
                    val_derr=ev.get("derr", 0.0),
                )
        return history

    def restore(self, ckpt_dir: str):
        """Resume from a checkpoint directory (the reference's
        load_checkpoint_and_params path, torch_implementation.py:865-872 +
        utilTorch_loadweight.py:6-115): full state + start epoch + metric
        history — or by-name partial params when the head layout changed
        (hanet / convDeconvOut / deeplab_mod trigger by-name loading in the
        reference, torch_implementation.py:865).

        A ``.pth``/``.pth.tar`` path imports a TORCH reference checkpoint
        (flagship or dsnetv2) through utils.torch_import instead — the
        migration path for users bringing reference-trained weights."""
        cfg = self.cfg
        if ckpt_dir.endswith((".pth", ".pth.tar", ".pt")):
            self.state = self.state.replace(
                **_import_torch_checkpoint(cfg, ckpt_dir)
            )
            if self.mesh is not None:
                self.state = replicate(self.mesh, self.state)
            return 0, []
        src = CheckpointManager(ckpt_dir)
        by_name = (cfg.model.hanet or bool(cfg.model.conv_deconv_out)
                   or cfg.model.net == "deeplab_mod")
        if by_name:
            self.state = src.restore_params_partial(self.state)
            start_epoch, history = 0, []
        else:
            self.state = src.restore(self.state)
            meta = src.load_meta()
            start_epoch = int(meta.get("epoch", -1)) + 1
            history = list(meta.get("history", []))
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        return start_epoch, history
