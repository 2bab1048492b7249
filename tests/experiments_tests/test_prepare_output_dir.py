"""prepare_output_dir tests (reference: tests/experiments_tests/
test_prepare_output_dir.py): artifact files, args serialization, and
seeding determinism."""

import argparse
import json
import os

import numpy as np

from pfrl_tpu.experiments.prepare_output_dir import (
    generate_exp_id,
    prepare_output_dir,
)
from pfrl_tpu.utils.random_seed import set_random_seed


def test_creates_dir_with_reproducibility_artifacts(tmp_path):
    outdir = prepare_output_dir(
        args={"lr": 1e-3, "env": "CartPole"},
        basedir=str(tmp_path),
        argv=["train.py", "--lr", "0.001"],
    )
    assert os.path.isdir(outdir)
    with open(os.path.join(outdir, "args.txt")) as f:
        args = json.load(f)
    assert args["lr"] == "0.001"
    assert args["env"] == "CartPole"
    with open(os.path.join(outdir, "command.txt")) as f:
        assert f.read() == "train.py --lr 0.001"
    assert os.path.exists(os.path.join(outdir, "environ.txt"))
    # Running inside a git repo: head/status captured.
    assert os.path.exists(os.path.join(outdir, "git-head.txt"))


def test_namespace_args_accepted(tmp_path):
    ns = argparse.Namespace(steps=100, gpu=None)
    outdir = prepare_output_dir(args=ns, basedir=str(tmp_path))
    with open(os.path.join(outdir, "args.txt")) as f:
        args = json.load(f)
    assert args["steps"] == "100"


def test_exp_id_unique_dirs(tmp_path):
    a = prepare_output_dir(basedir=str(tmp_path), exp_id="a")
    b = prepare_output_dir(basedir=str(tmp_path), exp_id="b")
    assert a != b and os.path.isdir(a) and os.path.isdir(b)


def test_generate_exp_id_prefix():
    eid = generate_exp_id(prefix="dqn")
    assert eid.startswith("dqn_")


def test_set_random_seed_deterministic():
    import jax

    key1 = set_random_seed(42)
    host1 = np.random.rand(3)
    key2 = set_random_seed(42)
    host2 = np.random.rand(3)
    np.testing.assert_array_equal(host1, host2)
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key2))
    # Device draws from the returned root key are deterministic too.
    d1 = jax.random.normal(key1, (4,))
    d2 = jax.random.normal(key2, (4,))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
