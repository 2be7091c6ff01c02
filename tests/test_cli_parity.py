"""CLI-surface parity: every reference flag must exist with the same name
and default (reference mmlf/train/cli.py:18-59, mmlf/validate/cli.py:191-208)."""

import pytest

REFERENCE_TRAIN_FLAGS = {
    'model_ksize': 2, 'model_in_blocks': 3, 'model_out_blocks': 8,
    'model_chs': 70, 'model_views': 9, 'model_cross': False,
    'model_uncert': False, 'model_discrete': False, 'model_unet': False,
    'model_invertible': False, 'model_clamp': 0.7, 'model_act_norm': 0.7,
    'model_act_norm_type': 'SOFTPLUS', 'model_soft_permutation': False,
    'model_no_batchnorm': False, 'model_batchnorm_momentum': 0.1,
    'train_trainset': '../lf-dataset/additional',
    'train_valset': '../lf-dataset/training',
    'train_no_data_augment': False, 'train_num_workers': 4,
    'train_lr': 1e-5, 'train_bs': 1, 'train_ps': 32, 'train_beta': 1.0,
    'train_mae_threshold': 0.02, 'train_max_downscale': 4,
    'train_resume': False, 'train_loss_padding': None, 'train_shift': 0.0,
    'train_loss_multimodal': False, 'train_loss_strongest': False,
    'train_eval_mode': False, 'train_eval_mode_start': 0,
    'train_warm_start': False, 'train_cooling': 0, 'val_interval': 100,
    'val_loss_margin': 15, 'val_ensamble': False, 'val_disp_min': -3.5,
    'val_disp_max': 3.5, 'val_disp_step': 0.1,
}

REFERENCE_VALIDATE_FLAGS = {
    'model_invertible': False, 'model_discrete': False,
    'val_loss_margin': 15, 'val_ensamble': False, 'val_disp_min': -3.5,
    'val_disp_max': 3.5, 'val_disp_step': 0.1, 'train_shift': 0.0,
}


def _flag_defaults(cli):
    return {p.name: p.default for p in cli.params}


def test_train_cli_covers_reference_flags():
    from mmlf_tpu.train.cli import main
    flags = _flag_defaults(main)
    for name, default in REFERENCE_TRAIN_FLAGS.items():
        assert name in flags, f'missing flag --{name}'
        assert flags[name] == default, \
            f'--{name} default {flags[name]!r} != reference {default!r}'


def test_validate_cli_covers_reference_flags():
    from mmlf_tpu.validate.cli import main
    flags = _flag_defaults(main)
    for name, default in REFERENCE_VALIDATE_FLAGS.items():
        assert name in flags, f'missing flag --{name}'
        assert flags[name] == default, \
            f'--{name} default {flags[name]!r} != reference {default!r}'


def test_config_matches_train_cli():
    """Config fields cover the whole reference flag surface."""
    from mmlf_tpu.config import Config
    cfg = Config()
    for name, default in REFERENCE_TRAIN_FLAGS.items():
        assert hasattr(cfg, name), name
        assert getattr(cfg, name) == default, name


def test_console_scripts_resolve():
    """Every [project.scripts] entry in pyproject.toml resolves to a click
    command (the reference ships no packaging metadata at all —
    requirements.txt was its only install story, reference README.md:62-83)."""
    import importlib
    import pathlib
    import tomllib

    import click

    root = pathlib.Path(__file__).resolve().parents[1]
    with open(root / 'pyproject.toml', 'rb') as f:
        project = tomllib.load(f)['project']
    scripts = project['scripts']
    assert 'mmlf-train' in scripts and 'mmlf-validate' in scripts
    for name, target in scripts.items():
        mod_name, attr = target.split(':')
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        # click command or a plain callable wrapper (data.synth:main)
        assert isinstance(fn, click.BaseCommand) or callable(fn), \
            f'{name} -> {target}'


def test_invertible_flag_fails_like_reference(tmp_path):
    """--model_invertible must raise the reference's NotImplementedError."""
    from mmlf_tpu.config import Config
    from mmlf_tpu.train.loop import train
    cfg = Config(model_invertible=True).finalize()
    with pytest.raises(NotImplementedError, match='not supported anymore'):
        train(cfg, str(tmp_path))
