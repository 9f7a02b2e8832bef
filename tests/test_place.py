"""Vocabulary tree + keyframe database tests."""

import cv2
import glob
import numpy as np
import pytest
import jax.numpy as jnp

from extractorb_tpu.config import ORBConfig
from extractorb_tpu.frontend.extractor import ORBExtractor
from extractorb_tpu.place.database import KeyFrameDatabase
from extractorb_tpu.place.vocab import Vocabulary, _hamming_np


@pytest.fixture(scope="module")
def frames_desc():
    ext = ORBExtractor(ORBConfig(n_features=500), octree="device")
    paths = sorted(glob.glob("/root/reference/pic/robot/*.jpg"))[:8]
    out = []
    for p in paths:
        img = cv2.imread(p, 0)
        f = ext(jnp.asarray(img))
        v = np.asarray(f.valid)
        out.append(np.asarray(f.desc)[v])
    return out


@pytest.fixture(scope="module")
def vocab(frames_desc):
    descs = np.concatenate(frames_desc[:5], 0)
    return Vocabulary.train(descs, k=8, L=3, seed=0)


def test_vocab_structure(vocab):
    assert vocab.n_words > 100
    assert (vocab.weights >= 0).all()


def test_transform_assigns_nearest_path(vocab, frames_desc):
    d = frames_desc[0][:200]
    words = vocab.transform_words(d)
    assert words.min() >= 0 and words.max() < vocab.n_words
    # identical descriptors get identical words
    words2 = vocab.transform_words(d)
    assert np.array_equal(words, words2)
    # many distinct words used (discriminative)
    assert len(np.unique(words)) > 50


def test_bow_self_similarity(vocab, frames_desc):
    """A frame must score itself higher than a different frame."""
    db = KeyFrameDatabase(vocab, capacity=16)
    for i, d in enumerate(frames_desc):
        db.add(i, d)
    # robot 865..872 sequence then 1847/2195 series: query with a noisy
    # subset of frame 0's descriptors
    q = frames_desc[0][::2]
    res = db.query(q, n_best=3)
    assert res, "no candidates"
    assert res[0][0] == 0, res


def test_db_erase(vocab, frames_desc):
    db = KeyFrameDatabase(vocab, capacity=16)
    for i, d in enumerate(frames_desc[:4]):
        db.add(i, d)
    db.erase(0)
    res = db.query(frames_desc[0], n_best=2)
    assert all(k != 0 for k, _ in res)


def test_db_exclude(vocab, frames_desc):
    db = KeyFrameDatabase(vocab, capacity=16)
    for i, d in enumerate(frames_desc[:4]):
        db.add(i, d)
    res = db.query(frames_desc[0], exclude={0}, n_best=2)
    assert all(k != 0 for k, _ in res)
