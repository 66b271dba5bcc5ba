"""Checkpoint/resume via orbax: async pytree save of
{params, opt_state, step/epoch, config snapshot, best metric}.

Capability parity with the reference's torch.save dict
{model, optimizer, lr_scheduler, config, epoch}
(image_Retrieval_caption.py:478-499), best-sumR gating and last-epoch
fallback, plus a REAL `--resume` (the reference's resume is a hard-coded
`RESUME = False` block, :429-438 — SURVEY.md §7 fidelity footnote).
The LR schedule is a pure function of the step here, so persisting `step`
subsumes the reference's lr_scheduler state."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, keep: int = 2):
        self.dir = Path(output_dir).resolve() / "checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )
        # best-metric saves live in their own manager so the rotation of
        # periodic/preemption snapshots can never evict them (the reference
        # keeps checkpoint_best.pth permanently, image_…py:478-499)
        self.best_dir = self.dir / "best"
        self.best_manager = ocp.CheckpointManager(
            str(self.best_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True, enable_async_checkpointing=True),
        )
        self.best_path = self.dir / "best.json"

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any,
        epoch: int,
        config_json: str = "",
        metrics: Optional[Dict[str, float]] = None,
        is_best: bool = False,
        steps_per_epoch: int = 0,
        ema_params: Any = None,
    ) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            # steps_per_epoch is persisted so resume can detect dataset/
            # batch-size drift DIRECTLY (a slightly-changed steps_per_epoch
            # can still land the derived epoch in range, silently mis-
            # phasing the data stream — ADVICE r2)
            "meta": {"step": step, "epoch": epoch,
                     "steps_per_epoch": steps_per_epoch},
        }
        if ema_params is not None:
            state["ema_params"] = ema_params
        # orbax saves are collective: every process calls save() with the
        # global arrays; the sidecar json files are written once
        self.manager.save(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardSave(state)))
        if is_best:
            self.best_manager.save(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardSave(state)))
        import jax

        if jax.process_index() != 0:
            return
        if config_json:
            (self.dir / "config.json").write_text(config_json)
        if is_best:
            self.best_path.write_text(json.dumps(
                {"step": step, "epoch": epoch, "metrics": metrics or {}}))

    def wait(self) -> None:
        self.manager.wait_until_finished()
        self.best_manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    @staticmethod
    def _restore_state(manager, abstract_state: Any, step: int):
        """StandardRestore with layout tolerance: the orbax tree structures
        must match exactly, so retry over the optional-key variants —
        checkpoints written before/after the steps_per_epoch meta key, and
        with/without "ema_params" (whose leaves mirror the params
        abstract) — so any run config can restore any checkpoint."""
        def attempt(abstract):
            return manager.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract)))["state"]

        def meta_toggled(a):
            alt = dict(a)
            meta = dict(alt.get("meta", {}))
            if "steps_per_epoch" in meta:
                meta.pop("steps_per_epoch")
            else:
                meta["steps_per_epoch"] = 0
            alt["meta"] = meta
            return alt

        def ema_toggled(a):
            alt = dict(a)
            if "ema_params" in alt:
                alt.pop("ema_params")
            else:
                alt["ema_params"] = alt["params"]
            return alt

        last: Optional[Exception] = None
        for variant in (abstract_state, meta_toggled(abstract_state),
                        ema_toggled(abstract_state),
                        meta_toggled(ema_toggled(abstract_state))):
            try:
                return attempt(variant)
            except ValueError as e:
                last = e
        raise last

    def restore(
        self, abstract_state: Any, step: Optional[int] = None
    ) -> Tuple[Any, Any, Any, Dict[str, int]]:
        """Restore (params, opt_state, ema_params_or_None, meta).
        abstract_state is a pytree of jax.ShapeDtypeStruct (or concrete
        arrays) matching save()'s layout; optional keys are tolerated
        either way (_restore_state)."""
        step = step if step is not None else self.manager.latest_step()
        assert step is not None, "no checkpoint to restore"
        state = self._restore_state(self.manager, abstract_state, step)
        return (state["params"], state["opt_state"],
                state.get("ema_params"), state["meta"])

    def restore_best(
        self, abstract_state: Any
    ) -> Tuple[Any, Any, Any, Dict[str, int]]:
        """Restore the best-metric checkpoint (never evicted by rotation)."""
        step = self.best_manager.latest_step()
        assert step is not None, "no best checkpoint saved"
        state = self._restore_state(self.best_manager, abstract_state, step)
        return (state["params"], state["opt_state"],
                state.get("ema_params"), state["meta"])

    def best_info(self) -> Optional[Dict]:
        if self.best_path.exists():
            return json.loads(self.best_path.read_text())
        return None
