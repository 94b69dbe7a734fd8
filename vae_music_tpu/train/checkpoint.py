"""Orbax checkpointing.

The reference injects a ``tf.train.CheckpointManager`` into its monitor
callbacks (vae_monitor.py:28-31,55-58; monitors.py:31-33,68-70) and the author
notes the step counter is NOT restored on resume (monitors.py:38-40).  Here
the whole train state — params, optimizer slots, VQ EMA codebooks AND the step
— is one pytree, so save/restore is exact and resumable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None,
                shardings: Optional[Any] = None) -> Any:
        """Restore into the structure of ``template`` (a freshly-built state).

        ``shardings`` (optional): a congruent pytree of ``NamedSharding``s —
        e.g. ``parallel.fsdp.fsdp_state_sharding(mesh, template)`` or
        ``parallel.pipeline.pp_state_sharding(mesh, template)``.  Each leaf is
        then restored DIRECTLY to its target placement (Orbax reads each
        device's shard from disk); no replicated copy of the state ever
        materializes in host or device memory.  ``template`` may itself be
        abstract (``jax.eval_shape`` output) — only ``.shape``/``.dtype`` are
        read — so a Jukebox-scale FSDP state that does not fit replicated can
        be restored without ever building a concrete template.

        Without ``shardings``, leaves restore to the template's own placement
        (sharded templates restore sharded; fresh CPU templates replicate).
        """
        if step is None:
            step = self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if shardings is None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template)
        else:
            abstract = jax.tree_util.tree_map(
                lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype,
                                                  sharding=s),
                template, shardings)
        return self.mngr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_params(self, step: Optional[int] = None) -> dict:
        """Restore only the inference-relevant leaves — params (+ codebooks,
        for VQ-VAE states) and the step — WITHOUT an optimizer template.

        ``restore()`` needs a template whose opt_state tree matches the
        checkpoint's, which breaks when the optimizer changed between save
        and load (e.g. a prior trained with ``--accum_steps`` wraps its
        opt_state in optax.MultiSteps).  Serving paths don't need opt_state
        at all, so this reads the raw tree and rebuilds just params/codebooks.
        """
        if step is None:
            step = self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        raw = self.mngr.restore(step)
        out = {"params": raw["params"], "step": raw.get("step")}
        if "codebooks" in raw:
            from vae_music_tpu.nn.quantizer import CodebookState

            out["codebooks"] = tuple(
                CodebookState(c["embeddings"], c["m_t"], c["N_t"])
                for c in raw["codebooks"])
        return out

    def close(self):
        self.mngr.close()


def save_pipeline_artifact(path: str, vqvae_params, codebooks, prior_params) -> None:
    """Params-only serving artifact of a trained pipeline (no optimizer state).

    This is what the reference's workflow produces at the end (trained
    weights a Sampler can load — /root/reference/Sampler.py:27-31 builds
    priors around restored checkpoints); scripts/soak.py writes one and
    bench.py loads it so generation benchmarks run on TRAINED weights.
    """
    tree = {
        "vqvae_params": vqvae_params,
        "codebooks": [
            {"embeddings": c.embeddings, "m_t": c.m_t, "N_t": c.N_t}
            for c in codebooks
        ],
        "prior_params": list(prior_params),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_pipeline_artifact(path: str):
    """Inverse of :func:`save_pipeline_artifact`.

    Returns (vqvae_params, codebooks tuple, prior_params list — bottom
    level first, matching AncestralSampler.prior_params).

    Device-portable: the artifact's stored shardings name the devices it was
    saved on (e.g. the TPU), so restore goes through abstract
    shape/dtype-only targets built from the checkpoint's own metadata —
    loading on CPU what was trained on TPU (and vice versa) just works.
    """
    from vae_music_tpu.nn.quantizer import CodebookState

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path)
    tree_meta = getattr(meta, "item_metadata", meta)
    here = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=here),
        tree_meta)
    raw = ckptr.restore(path, abstract)
    ckptr.close()
    cbs = tuple(CodebookState(c["embeddings"], c["m_t"], c["N_t"])
                for c in raw["codebooks"])
    return raw["vqvae_params"], cbs, list(raw["prior_params"])


def restore_sampler(sampler, vqvae_ckpt=None, prior_ckpts=None):
    """Template-free restore of trained weights into an AncestralSampler —
    the shared CLI path (generate / export_serving).

    ``prior_ckpts`` is one checkpoint dir per level, bottom first.
    """
    if vqvae_ckpt:
        restored = CheckpointManager(vqvae_ckpt).restore_params()
        sampler.vqvae_params = restored["params"]
        sampler.codebooks = restored["codebooks"]
    if prior_ckpts:
        for level, path in enumerate(prior_ckpts):
            sampler.prior_params[level] = (
                CheckpointManager(path).restore_params()["params"])
    return sampler
