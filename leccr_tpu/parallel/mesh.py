"""Device mesh + sharding layout.

The reference's distributed runtime is an NCCL process group + DDP
(SURVEY.md §2c); the TPU-native equivalent is a single-controller program
over a `jax.sharding.Mesh` with two axes:

- `data`: the batch axis (DistributedSampler + DDP parity). Gradients are
  reduced automatically by XLA because the loss is a mean over the globally
  sharded batch — no hand-written all-reduce.
- `model`: tensor parallelism for large towers (ViT-L/14 scale-up,
  BASELINE.json config #5). Dense kernels are sharded column-/row-wise and
  XLA GSPMD inserts the activation collectives.

On one chip both axes are 1 and everything below degenerates to no-ops.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leccr_tpu.config import ParallelConfig


def _dcn_slice_major(devices, dcn: int, need: Optional[int] = None):
    """Order devices slice-major for a multi-slice (DCN-connected) pod.

    The mesh keeps its two LOGICAL axes; multi-slice locality is purely a
    device-ordering property: with all of slice 0's chips first, then slice
    1's, …, the `data` axis's contiguous `model`-sized groups stay inside a
    slice (tensor-parallel collectives ride ICI), the gradient psum over
    `data` decomposes hierarchically (XLA reduces within each slice over
    ICI, then across slices over DCN — it sees the slice structure in the
    device assignment), and a ppermute ring crosses DCN only at the `dcn`
    slice boundaries per rotation (a [B/W, 256] tile — KBs).

    Devices that expose `slice_index` (real multi-slice TPU) are sorted by
    (slice_index, id); otherwise (virtual/CPU meshes, single slice) the
    given order is trusted as slice-major.

    `need` (the mesh's device count) lets the ordering be VALIDATED, not
    just produced: each of the `dcn` contiguous groups of `need/dcn`
    devices must be a union of whole physical slices — a slice straddling
    a group boundary would silently put intra-group collectives on DCN,
    defeating the locality this ordering exists to provide."""
    ids = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in ids):
        return list(devices)
    order = sorted(range(len(devices)),
                   key=lambda k: (ids[k], devices[k].id))
    if need is not None and len({ids[k] for k in order[:need]}) > 1:
        # single physical slice: dcn grouping is purely logical (all
        # traffic rides ICI anyway) — only validate when the selection
        # actually spans slices
        sel = [ids[k] for k in order[:need]]
        gsz = need // dcn
        for g in range(1, dcn):
            assert sel[g * gsz - 1] != sel[g * gsz], (
                f"dcn_data={dcn}: physical slice {sel[g * gsz]} straddles "
                f"the boundary between dcn groups {g - 1} and {g} "
                f"(slice sizes don't tile the {need}-device mesh into "
                f"{dcn} slice-aligned groups)")
    return [devices[k] for k in order]


def make_mesh(cfg: Optional[ParallelConfig] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = cfg.model if cfg else 1
    data = cfg.data if cfg else -1
    dcn = getattr(cfg, "dcn_data", 1) if cfg else 1
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} > {n} devices"
    if dcn > 1:
        assert data % dcn == 0, (
            f"data={data} must split evenly over dcn_data={dcn} slices")
        assert need % dcn == 0 and (need // dcn) % model == 0, (
            f"model={model} groups must not straddle a slice boundary")
        devices = _dcn_slice_major(devices, dcn, need)
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_spec() -> P:
    return P("data")


def replicated_spec() -> P:
    return P()


# Tensor-parallel layout for transformer Dense kernels.  Column-parallel
# (shard output features) for up-projections, row-parallel (shard input
# features) for down-projections; everything else replicated.
_COL_PARALLEL = re.compile(
    r"(c_fc|in_proj|intermediate|query|key|value|linear1)$")
_ROW_PARALLEL = re.compile(r"(c_proj|out_proj|output|out|linear2)$")


def param_partition_spec(path: Tuple[str, ...], leaf) -> P:
    """Map a param path to a PartitionSpec over the `model` axis."""
    if leaf.ndim < 2:
        return P()
    parent = path[-2] if len(path) >= 2 else ""
    name = path[-1]
    if name == "kernel" and leaf.ndim == 2:
        if _COL_PARALLEL.search(parent):
            return P(None, "model")
        if _ROW_PARALLEL.search(parent):
            return P("model", None)
    if name == "embedding" and leaf.ndim == 2:
        return P(None, "model") if leaf.shape[1] % 2 == 0 else P()
    return P()


# params below this size stay replicated under FSDP: gathering a few KB
# per layer costs more in collective latency than the sharding saves
# (default for ParallelConfig.fsdp_min_size / direct callers)
_FSDP_MIN_SIZE = 1 << 16


def params_shardings(mesh: Mesh, params, fsdp: bool = False,
                     fsdp_min_size: int = _FSDP_MIN_SIZE) -> Any:
    """NamedSharding pytree for the params.

    - model axis: tensor parallelism per `param_partition_spec`.
    - fsdp=True additionally shards every large param's largest free dim
      over the `data` axis (ZeRO-3 / fully-sharded data parallel): XLA
      all-gathers a weight just before use, reduce-scatters its gradient,
      and the Adam moments inherit the sharding through the jitted
      `tx.init` — per-chip param+moment HBM drops by ~data×.  The video
      model's 11 GB fp32 state (DESIGN.md) is the motivating case: bs128
      OOMs one chip but fits under fsdp on a data=8 mesh."""
    data_n = mesh.shape.get("data", 1) if fsdp else 1
    if mesh.shape.get("model", 1) == 1 and data_n == 1:
        return jax.tree.map(
            lambda _: NamedSharding(mesh, P()), params)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(kp, leaf):
        path = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        spec = param_partition_spec(path, leaf)
        # only shard when divisible
        for axis_size, axis_name in zip(leaf.shape, spec):
            if axis_name == "model" and axis_size % mesh.shape["model"]:
                spec = P()
                break
        if data_n > 1 and leaf.size >= fsdp_min_size:
            dims = list(spec) + [None] * (leaf.ndim - len(spec))
            for d in sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d]):
                if dims[d] is None and leaf.shape[d] % data_n == 0:
                    dims[d] = "data"
                    spec = P(*dims)
                    break
        return spec

    specs = {kp: spec_for(kp, leaf) for kp, leaf in flat}
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(mesh, specs[kp]), params)


def host_local_to_global(x, sharding: NamedSharding):
    """Place process-local host data as a global sharded array.

    Single-process: plain device_put (the local batch IS the global batch).
    Multi-process: `jax.make_array_from_process_local_data` — each process
    contributes the rows covered by its addressable shards (the per-process
    slice the loaders produce), which is the only sanctioned way to build a
    jit input spanning non-addressable devices.  The reference instead keeps
    per-rank tensors and lets DDP/NCCL reconcile; here the global array is
    explicit and XLA partitions the program around it."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Device-put a host batch sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: host_local_to_global(x, sharding), batch)
