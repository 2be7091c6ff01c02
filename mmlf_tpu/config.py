"""Configuration for mmlf_tpu.

One dataclass holds every hyper-parameter.  Flag names and defaults exactly
match the reference CLI (reference: mmlf/train/cli.py:18-59 and
mmlf/validate/cli.py:191-208) so that command lines are interchangeable.

The config dict travels inside every checkpoint ("hyper_parameters"), and
``mmlf_tpu.validate.cli`` reconstructs the model from the stored config with
CLI flags overriding only ``model_discrete`` / disparity range /
``train_shift`` — the contract of reference mmlf/validate/cli.py:214-217.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional


@dataclass
class Config:
    # --- model ---
    model_ksize: int = 2
    model_in_blocks: int = 3
    model_out_blocks: int = 8
    model_chs: int = 70
    model_views: int = 9
    model_cross: bool = False
    model_uncert: bool = False
    model_discrete: bool = False
    model_unet: bool = False
    model_invertible: bool = False
    model_clamp: float = 0.7
    model_act_norm: float = 0.7
    model_act_norm_type: str = 'SOFTPLUS'
    model_soft_permutation: bool = False
    model_no_batchnorm: bool = False
    model_batchnorm_momentum: float = 0.1

    # --- training ---
    train_trainset: str = '../lf-dataset/additional'
    train_valset: str = '../lf-dataset/training'
    train_no_data_augment: bool = False
    train_num_workers: int = 4
    train_lr: float = 1e-5
    train_bs: int = 1
    train_ps: int = 32
    train_beta: float = 1.0
    train_mae_threshold: float = 0.02
    train_max_downscale: int = 4
    train_resume: bool = False
    train_loss_padding: Optional[float] = None
    train_shift: float = 0.0
    train_loss_multimodal: bool = False
    train_loss_strongest: bool = False
    train_eval_mode: bool = False
    train_eval_mode_start: int = 0
    train_warm_start: bool = False
    train_cooling: int = 0

    # --- validation ---
    val_interval: int = 100
    val_loss_margin: int = 15
    val_ensamble: bool = False
    val_disp_min: float = -3.5
    val_disp_max: float = 3.5
    val_disp_step: float = 0.1

    # --- derived (filled by finalize(); stored for checkpoint parity) ---
    model_radius: int = 0

    # --- TPU-native extensions (not in the reference CLI) ---
    mesh_data: int = 0          # data-parallel mesh size; 0 = all devices
    train_seed: int = 0         # RNG seed for data augmentation + init
    train_steps: int = 0        # stop after N steps; 0 = run forever
    bf16: bool = False          # bfloat16 activations in the conv trunk
    cache_bf16: bool = False    # bfloat16 *image* scene cache (gt/MPI stay fp32)
    host_pipeline: bool = False  # force host-side window extraction
    remat: bool = False          # rematerialize conv blocks (big batches)
    pallas_trunk: bool = False   # fused Pallas canvas trunk (train, TPU;
    # shard_mapped per device on a multi-chip mesh)
    train_accum: int = 1         # gradient-accumulation microbatches; the
    # reference's bs=512 recipe runs 64/GPU on 8 GPUs — accum=8 reproduces
    # the global batch (and DataParallel's per-replica-64 BN) on ONE chip
    train_accum_exact: bool = False  # weight accumulation chunks by their
    # valid-pixel counts: exactly the reference's ONE-masked-mean over the
    # global batch even when per-chunk mask counts differ.  Off = uniform
    # chunk averaging, measured IDENTICAL on the README recipe (counts
    # match; deviation 0.0 — scripts/accum_mean_probe.py); the flag
    # matters only for heavily/unevenly masked datasets
    train_profile: bool = False  # capture a jax.profiler trace early on
    train_nan_guard: bool = False  # stop if the loss goes non-finite
    train_logvar_warmup: int = 0  # ramp the uncertainty (logvar) coupling
    # over N steps: the training loss sees logvar*min(step/N, 1), so at
    # step 0 the UPR loss is EXACTLY masked L1 and reaches the reference
    # loss by step N.  0 (default) = reference-exact.  A RESCUE lever for
    # the aleatoric-uncertainty collapse the reference recipe is prone to
    # (seed-dependent: a badly-initialized logvar head can blow up the
    # exp(-logvar) term and drag training into a high-uncertainty optimum
    # where the mean head never learns).  It reliably repairs the mean
    # head, but logvar CALIBRATION — what ESE min-logvar selection needs —
    # stays run-fragile with or without it (one healthy arm's ESE went
    # 2.7 → 80.8 MSE×100 under warmup); validate ESE per checkpoint.
    # See docs/STATUS.md seed-variance + seed-0 completion.
    train_logvar_anchor: float = 0.0  # weight of the logvar calibration
    # anchor (losses.logvar_anchor): quadratic pull of logvar toward the
    # DETACHED per-pixel log|error|.  Targets the loss's own pointwise
    # optimum (exp(logvar) = |err|) but makes it non-tradeable, so the
    # uncertainty head can neither collapse (exp(-logvar) killing the data
    # term) nor miscalibrate into a function of the input shift — the two
    # failure modes that break ESE min-logvar selection (docs/STATUS.md).
    # 0 (default) = reference-exact dynamics.
    train_term_checkpoint: bool = True  # on SIGTERM (pod preemption,
    # scheduler eviction) finish the in-flight step, write the rolling
    # checkpoint at the CURRENT iteration, and return cleanly — the run
    # continues with --train_resume.  The reference dies un-checkpointed
    # (its only recovery is the last val-interval save)
    model_inn: bool = False      # WORKING invertible network (models/inn.py;
    # the reference's --model_invertible path is dead upstream and fails
    # identically here — this flag is the beyond-reference replacement)

    def finalize(self) -> 'Config':
        """Apply the reference's derived-value rules.

        reference mmlf/train/cli.py:63-69: model_radius is derived (and unused
        downstream, kept for checkpoint parity); val_ensamble implies
        model_uncert.
        """
        self.model_radius = (self.model_in_blocks + self.model_out_blocks) * \
            ((self.model_ksize + 1) // 2)
        if self.val_ensamble:
            self.model_uncert = True
        return self

    @property
    def steps(self) -> int:
        """Number of discrete disparity bins (reference feed_forward.py:81-84)."""
        s = 2 if self.model_cross else 4
        return s * self.model_views * 3

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> 'Config':
        """Build a Config from a flat dict, ignoring unknown keys.

        Mirrors the reference's tolerant ``FeedForward(**kwargs)`` behaviour
        where extra hyper-parameters are swallowed.
        """
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def save_json(self, path: str) -> None:
        with open(path, 'w') as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load_json(cls, path: str) -> 'Config':
        with open(path) as f:
            return cls.from_dict(json.load(f))
