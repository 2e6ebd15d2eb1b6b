"""Multi-host scaffold test (VERDICT #7): 2 real processes on CPU.

Spawns two python processes that jax.distributed.initialize against a local
coordinator, build the global mesh, iterate the SAME DataLoader config (each
loading only its per-host slice — never the global batch), assemble global
arrays with make_array_from_process_local_data, and run a psum over the
global mesh. Verifies per-host loading counts and the collective result.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    fixture_root = sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.parallel.mesh import (
        setup_distributed, make_mesh, DATA_AXIS,
    )
    os.environ["PMT_COORDINATOR"] = f"localhost:{{port}}"
    os.environ["PMT_NUM_PROCESSES"] = str(nproc)
    os.environ["PMT_PROCESS_ID"] = str(pid)
    assert setup_distributed() is True
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data.pipeline import (
        DataLoader, prefetch_to_mesh,
    )

    manifests = {{
        k: os.path.join(fixture_root, v) for k, v in
        json.load(open(os.path.join(fixture_root, "manifests.json"))).items()
    }}
    lp = D.read_manifest(manifests["left"])
    rp = D.read_manifest(manifests["right"])
    dp = D.read_manifest(manifests["disp"])
    sp = D.read_manifest(manifests["seg"])
    ip = D.read_manifest(manifests["inst"])
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    ds = D.StereoSegDataset(
        list(zip(lp, rp)), list(zip(dp, sp, ip)), 2, 100.0, "roses", norm,
        output_activation="linear",
    )
    calls = []
    orig = ds.load_raw
    ds.load_raw = lambda i: (calls.append(i), orig(i))[1]
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                        seed=0, process_index=jax.process_index(),
                        process_count=jax.process_count())
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 4  # 2 procs x 2 local devices
    it = prefetch_to_mesh(loader, mesh)
    batch, extras = next(it)
    assert batch["left"].shape[0] == 4  # GLOBAL batch
    # this host only loaded its half of the global batch
    assert len(calls) <= 2 * 2, calls  # <=2 per prefetched batch
    f = jax.jit(shard_map(lambda x: jax.lax.psum(x.sum(), DATA_AXIS),
                          mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P()))
    total = float(f(batch["disp"]))
    print(f"RESULT {{pid}} {{total:.6f}} {{sorted(set(calls))}}")
    """
)


@pytest.mark.skipif(os.environ.get("PMT_SKIP_MULTIPROC") == "1",
                    reason="multiproc disabled")
def test_two_process_data_parallel(tmp_path):
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
    import json

    manifests = D.make_roses_fixture(str(tmp_path), n_train=8, n_test=2,
                                     hw=(64, 96))
    rel = {k: os.path.basename(v) for k, v in manifests.items()}
    with open(tmp_path / "manifests.json", "w") as f:
        json.dump(rel, f)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo="/root/repo"))
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    results = {}
    loaded = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT"):
                _, pid, total, idxs = line.split(" ", 3)
                results[pid] = float(total)
                loaded[pid] = idxs
    assert set(results) == {"0", "1"}
    # both hosts agree on the global psum
    assert abs(results["0"] - results["1"]) < 1e-5, results
    # and loaded DISJOINT index sets
    assert loaded["0"] != loaded["1"], loaded
