"""CLI entry point — flag-compatible with the reference
(torch_implementation.py main, README.md:25):

    python -m pmt_learning_for_semantic_segmentation_and_disparity_tpu.cli.train \
        -colorL train_colorL.txt -colorR train_colorR.txt \
        -seg seg.txt -disp disp.txt -inst inst.txt \
        -net sdnet_mini_ext -backbone densenet -corrType 1dcorr \
        -crop 256 512 -b 8 -e 100 -loss cross_entropy lovasz_loss \
        -output_activation linear -datasetName roses -train 1

One process drives the whole TPU mesh (no mp.spawn / NCCL).
"""
from __future__ import annotations

import sys

from ..core.config import config_from_args
from ..training.loop import Session


def main(argv=None):
    from ..parallel.mesh import setup_distributed

    # multi-host rendezvous (PMT_COORDINATOR / PMT_NUM_PROCESSES /
    # PMT_PROCESS_ID) — the SPMD replacement for the reference's env://
    # NCCL init (torch_implementation.py:627-630). No-op on one host.
    setup_distributed()
    cfg = config_from_args(argv)
    print(f"model id: {cfg.model_id()}")
    session = Session(cfg)
    if cfg.run.train:
        history = session.fit()
        if history:
            print("final eval:", history[-1])
    else:
        import jax

        from ..data.datasets import build_datasets, normalization_for
        from ..data.pipeline import DataLoader
        from ..parallel import mesh_size

        norm = normalization_for(cfg.model.backbone, cfg.model.net)
        _, testset = build_datasets(
            cfg.data, cfg.model.output_activation, cfg.model.max_disp, norm,
            train=False,
        )
        # batch must shard over the mesh: round the requested batch down to
        # a device multiple (floor n_dev); tail batches are padded and the
        # padded rows masked (Session.evaluate drops them, so metrics equal
        # a batch-1 single-device eval — the reference's test_model runs
        # batch 1, torch_implementation.py:450)
        n_dev = (mesh_size(session.mesh)
                 if session.mesh is not None else 1)
        eval_batch = max(n_dev, (min(cfg.run.batch, max(1, len(testset)))
                                 // n_dev) * n_dev)
        loader = DataLoader(
            testset, eval_batch, shuffle=False, drop_last=False,
            bucket_hw=cfg.data.eval_shape, pad_batch=True,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        first = next(iter(loader))
        session.init_state(first)
        if cfg.run.load_weights:
            session.restore(cfg.run.load_weights)
        metrics = session.evaluate(
            loader,
            show_per_step=True,
            artifacts_dir="testResults" if (cfg.run.show_results or
                                            cfg.run.save_img) else None,
        )
        print(metrics)


if __name__ == "__main__":
    main()
