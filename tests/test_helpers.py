"""Tests for helpers, download/extract, YAML policy loading, distributed."""

import tarfile

import numpy as np
import pytest

from unet_implementations_tpu.data.augment import POLICY, load_policy_yaml
from unet_implementations_tpu.data.download import extract_archive
from unet_implementations_tpu.parallel.distributed import maybe_initialize_distributed
from unet_implementations_tpu.utils.helpers import (
    copy_files,
    create_directory,
    seed_everything,
    split_dataset,
)


class TestHelpers:
    def test_seed_everything_reproducible(self):
        seed_everything(7)
        a = np.random.random(3)
        seed_everything(7)
        b = np.random.random(3)
        np.testing.assert_array_equal(a, b)

    def test_split_dataset(self):
        train, val = split_dataset(list(range(100)), 0.2, seed=1)
        assert len(val) == 20 and len(train) == 80
        assert sorted(train + val) == list(range(100))
        t2, v2 = split_dataset(list(range(100)), 0.2, seed=1)
        assert train == t2 and val == v2

    def test_copy_files(self, tmp_path):
        src = tmp_path / "a.txt"
        src.write_text("x")
        n = copy_files([(src, tmp_path / "sub" / "b.txt")])
        assert n == 1 and (tmp_path / "sub" / "b.txt").read_text() == "x"

    def test_create_directory(self, tmp_path):
        p = create_directory(tmp_path / "x" / "y")
        assert p.is_dir()


class TestExtract:
    def test_extract_archive(self, tmp_path):
        content = tmp_path / "payload"
        (content / "Train" / "color").mkdir(parents=True)
        (content / "Train" / "color" / "a.jpg").write_bytes(b"fake")
        tar_path = tmp_path / "data.tar"
        with tarfile.open(tar_path, "w") as tar:
            tar.add(content / "Train", arcname="Train")
        out = extract_archive(tar_path, tmp_path / "raw")
        assert (out / "Train" / "color" / "a.jpg").read_bytes() == b"fake"


class TestPolicyYaml:
    def test_load_reference_format(self, tmp_path):
        yaml_text = """
cat:
  horizontal_flip_prob: 0.9
  rotate_limit: 20
  random_resized_crop:
    scale: [0.7, 1.0]
    prob: 0.5
dog:
  horizontal_flip_prob: 0.1
"""
        p = tmp_path / "aug.yaml"
        p.write_text(yaml_text)
        policy = load_policy_yaml(p)
        assert policy["hflip_prob"] == (0.9, 0.1)
        assert policy["rotate_limit"][0] == 20.0
        assert policy["rotate_limit"][1] == POLICY["rotate_limit"][1]  # default
        assert policy["rrc_scale_min"][0] == 0.7
        assert policy["rrc_prob"][0] == 0.5
        # untouched keys keep defaults
        assert policy["iso_prob"] == POLICY["iso_prob"]


class TestDistributed:
    def test_single_host_noop(self):
        assert maybe_initialize_distributed() is False
