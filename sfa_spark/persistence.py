"""Classifier model persistence: save → load → bit-identical predictions.

The reference serializes every fitted classifier and asserts identical
predictions after reload (Classifier.java:632-650 save/load;
AbstractClassifierTest.java:39-61 round-trip assertion). Here each model
family serializes to ONE JSON document (arrays via ``tolist()`` — python
float repr is shortest-round-trip, so float64 survives exactly; float32
tf-idf values are widened to their exact double and narrowed back on
load). The artifact is small (bins + bags/coefficients), broadcastable,
and human-inspectable — the Spark-native stand-in for Kryo blobs.

Public surface:
  save_model(model, path) / load_model(path)
  model_to_dict(model)    / model_from_dict(d)

Supported: SFAModel, SupervisedSFAModel, BOSSEnsemble, BOSSVSEnsemble,
WEASELModel, MUSEModel, ShotgunModel (+ lists of ShotgunModel — the
shotgun ensemble).
"""

from __future__ import annotations

import json

import numpy as np

from sfa_spark import muse as _muse
from sfa_spark import shotgun as _shotgun
from sfa_spark import weasel as _weasel
from sfa_spark.classifiers import (
    BOSSEnsemble,
    BOSSMember,
    BOSSVSEnsemble,
    BOSSVSMember,
)
from sfa_spark.transform.sfa import SFAModel
from sfa_spark.transform.sfa_supervised import SupervisedSFAModel


def _arr(a: np.ndarray) -> dict:
    return {"data": np.asarray(a).tolist(), "dtype": str(np.asarray(a).dtype)}


def _unarr(d: dict) -> np.ndarray:
    return np.asarray(d["data"], dtype=d["dtype"])


def _lr_to_dict(lr) -> dict:
    w, b, classes = lr
    return {"w": _arr(w), "b": _arr(b), "classes": _arr(classes)}


def _lr_from_dict(d) -> tuple:
    return (_unarr(d["w"]), _unarr(d["b"]), _unarr(d["classes"]))


def _ssfa_to_dict(m: SupervisedSFAModel) -> dict:
    return {"base": m.base.to_dict(), "best_indices": _arr(m.best_indices)}


def _ssfa_from_dict(d) -> SupervisedSFAModel:
    return SupervisedSFAModel(
        base=SFAModel.from_dict(d["base"]), best_indices=_unarr(d["best_indices"])
    )


def model_to_dict(model) -> dict:
    if isinstance(model, SFAModel):
        return {"kind": "sfa", **model.to_dict()}
    if isinstance(model, SupervisedSFAModel):
        return {"kind": "sfa_supervised", **_ssfa_to_dict(model)}
    if isinstance(model, BOSSEnsemble):
        return {
            "kind": "boss_ensemble",
            "norm_mean": model.norm_mean,
            "members": [
                {
                    "sfa": m.sfa.to_dict(),
                    "window": m.window,
                    "features": m.features,
                    "train_score": m.train_score,
                    "train_mat": _arr(m.train_mat),
                    # JSON keys are strings — store vocab as item pairs
                    "train_vocab": [[int(k), int(v)] for k, v in m.train_vocab.items()],
                    "train_labels": _arr(m.train_labels),
                }
                for m in model.members
            ],
        }
    if isinstance(model, BOSSVSEnsemble):
        return {
            "kind": "bossvs_ensemble",
            "norm_mean": model.norm_mean,
            "members": [
                {
                    "sfa": m.sfa.to_dict(),
                    "window": m.window,
                    "features": m.features,
                    "train_score": m.train_score,
                    "class_labels": _arr(m.class_labels),
                    # label → {word → float32}; float32 widens to its exact
                    # double in JSON and narrows back exactly on load
                    "tfidf": [
                        [float(lbl), [[int(w), float(v)] for w, v in stat.items()]]
                        for lbl, stat in m.tfidf.items()
                    ],
                }
                for m in model.members
            ],
        }
    if isinstance(model, _weasel.WEASELModel):
        return {
            "kind": "weasel",
            "windows": list(model.windows),
            "norm_mean": model.norm_mean,
            "features": model.features,
            "train_cv_correct": model.train_cv_correct,
            "sfa_models": [_ssfa_to_dict(m) for m in model.sfa_models],
            # feature keys are tuples ("u", word, wi) / ("b", w1, w2, wi)
            "feature_index": [[list(k), int(v)] for k, v in model.feature_index.items()],
            "lr_model": _lr_to_dict(model.lr_model),
        }
    if isinstance(model, _muse.MUSEModel):
        return {
            "kind": "muse",
            "windows": list(model.windows),
            "norm_mean": model.norm_mean,
            "hist": model.hist,
            "features": model.features,
            "n_dims": model.n_dims,
            "train_cv_correct": model.train_cv_correct,
            "sfa_models": [m.to_dict() for m in model.sfa_models],
            "feature_index": [[list(k), int(v)] for k, v in model.feature_index.items()],
            "lr_model": _lr_to_dict(model.lr_model),
        }
    if isinstance(model, _shotgun.ShotgunModel):
        return {
            "kind": "shotgun",
            "window": model.window,
            "norm_mean": model.norm_mean,
            "train_score": model.train_score,
            "train": [_arr(s) for s in model.train],
            "train_labels": _arr(model.train_labels),
        }
    if isinstance(model, list) and all(
        isinstance(m, _shotgun.ShotgunModel) for m in model
    ):
        return {"kind": "shotgun_ensemble", "members": [model_to_dict(m) for m in model]}
    raise TypeError(f"unsupported model type: {type(model)!r}")


def model_from_dict(d: dict):
    kind = d["kind"]
    body = {k: v for k, v in d.items() if k != "kind"}
    if kind == "sfa":
        return SFAModel.from_dict(body)
    if kind == "sfa_supervised":
        return _ssfa_from_dict(body)
    if kind == "boss_ensemble":
        return BOSSEnsemble(
            members=[
                BOSSMember(
                    sfa=SFAModel.from_dict(m["sfa"]),
                    window=m["window"],
                    features=m["features"],
                    train_score=m["train_score"],
                    train_mat=_unarr(m["train_mat"]),
                    train_vocab={k: v for k, v in m["train_vocab"]},
                    train_labels=_unarr(m["train_labels"]),
                )
                for m in body["members"]
            ],
            norm_mean=body["norm_mean"],
        )
    if kind == "bossvs_ensemble":
        return BOSSVSEnsemble(
            members=[
                BOSSVSMember(
                    sfa=SFAModel.from_dict(m["sfa"]),
                    window=m["window"],
                    features=m["features"],
                    train_score=m["train_score"],
                    class_labels=_unarr(m["class_labels"]),
                    tfidf={
                        lbl: {w: np.float32(v) for w, v in stat}
                        for lbl, stat in m["tfidf"]
                    },
                )
                for m in body["members"]
            ],
            norm_mean=body["norm_mean"],
        )
    if kind == "weasel":
        return _weasel.WEASELModel(
            windows=list(body["windows"]),
            norm_mean=body["norm_mean"],
            features=body["features"],
            sfa_models=[_ssfa_from_dict(m) for m in body["sfa_models"]],
            feature_index={tuple(k): v for k, v in body["feature_index"]},
            lr_model=_lr_from_dict(body["lr_model"]),
            train_cv_correct=body["train_cv_correct"],
        )
    if kind == "muse":
        return _muse.MUSEModel(
            windows=list(body["windows"]),
            norm_mean=body["norm_mean"],
            hist=body["hist"],
            features=body["features"],
            n_dims=body["n_dims"],
            sfa_models=[SFAModel.from_dict(m) for m in body["sfa_models"]],
            feature_index={tuple(k): v for k, v in body["feature_index"]},
            lr_model=_lr_from_dict(body["lr_model"]),
            train_cv_correct=body["train_cv_correct"],
        )
    if kind == "shotgun":
        return _shotgun.ShotgunModel(
            window=body["window"],
            norm_mean=body["norm_mean"],
            train=[_unarr(s) for s in body["train"]],
            train_labels=_unarr(body["train_labels"]),
            train_score=body["train_score"],
        )
    if kind == "shotgun_ensemble":
        return [model_from_dict(m) for m in body["members"]]
    raise ValueError(f"unknown model kind: {kind!r}")


def save_model(model, path: str) -> None:
    with open(path, "w") as f:
        json.dump(model_to_dict(model), f)


def load_model(path: str):
    with open(path) as f:
        return model_from_dict(json.load(f))
