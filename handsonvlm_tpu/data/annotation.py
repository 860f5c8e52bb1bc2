"""EPIC-KITCHENS annotation loading (pandas, host-side).

Behavioral spec from `hoi_forecast/dataset/annotation.py:14-245`: EK55/EK100
csv parsing, RULSTM train/val splits, actions.csv generation, uid layout
(EK100 uids = row index, validation offset by len(train)), label filtering
via video_info.json.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Tuple

import numpy as np
import pandas as pd

from handsonvlm_tpu.data import epic_constants as C


def timestr2sec(t_str: str) -> float:
    hh, mm, ss = [float(x) for x in t_str.split(":")]
    return hh * 3600.0 + mm * 60.0 + ss


def str2list(s: str, out_type=None):
    s = s.replace("[", "").replace("]", "").replace("'", "")
    parts = s.split(", ")
    if out_type is not None:
        parts = [out_type(p) for p in parts]
    return parts


def read_rulstm_splits(rulstm_dir: str) -> Tuple[pd.DataFrame, pd.DataFrame]:
    header = ["uid", "video_id", "start_frame", "stop_frame", "verb_class", "noun_class", "action_class"]
    df_train = pd.read_csv(os.path.join(rulstm_dir, "training.csv"), names=header)
    df_validation = pd.read_csv(os.path.join(rulstm_dir, "validation.csv"), names=header)
    return df_train, df_validation


def create_actions_df(ek_version: str, out_path: str) -> None:
    """RULSTM actions.csv -> normalized action table (annotation.py:65-122,
    rulstm-splits branch — the shipped configuration)."""
    df_actions = pd.read_csv(os.path.join(C.rulstm_annotation_dir(ek_version), "actions.csv"))
    if ek_version == "ek100":
        df_actions["action"] = df_actions.action.map(lambda x: x.replace(" ", "_"))
    df_actions["verb_class"] = df_actions.verb
    df_actions["noun_class"] = df_actions.noun
    df_actions["verb"] = df_actions.action.map(lambda x: x.split("_")[0])
    df_actions["noun"] = df_actions.action.map(lambda x: x.split("_")[1])
    df_actions["action_class"] = df_actions.id
    del df_actions["id"]
    df_actions.to_csv(out_path, index=False)


def _attach_action_classes(df: pd.DataFrame, ek_version: str) -> pd.DataFrame:
    actions_df_path = os.path.join(C.annotation_dir(ek_version), "actions.csv")
    if not os.path.exists(actions_df_path):
        # fall back to a writable location if the annotation dir is read-only
        alt = os.path.join(C.label_cache_dir(ek_version), "actions.csv")
        if not os.path.exists(alt):
            os.makedirs(os.path.dirname(alt), exist_ok=True)
            create_actions_df(ek_version, alt)
        actions_df_path = alt
    df_actions = pd.read_csv(actions_df_path)

    action_classes, actions = [], []
    lut = {
        (int(r.verb_class), int(r.noun_class)): (int(r.action_class), r.action)
        for r in df_actions.itertuples()
    }
    for _, row in df.iterrows():
        a_cl, a = lut[(int(row.verb_class), int(row.noun_class))]
        action_classes.append(a_cl)
        actions.append(a)
    df["action_class"] = action_classes
    df["action"] = actions
    df["all_nouns"] = df["all_nouns"].map(lambda x: str2list(x) if isinstance(x, str) else x)
    df["all_noun_classes"] = df["all_noun_classes"].map(
        lambda x: str2list(x, int) if isinstance(x, str) else x
    )
    return df


def get_ek100_annotation(split: str, use_label_only: bool = True) -> pd.DataFrame:
    adir = C.annotation_dir("ek100")
    if split == "train":
        df = pd.read_csv(os.path.join(adir, "EPIC_100_train.csv"))
        uids = np.arange(len(df))
    elif split == "validation":
        df_train = pd.read_csv(os.path.join(adir, "EPIC_100_train.csv"))
        df = pd.read_csv(os.path.join(adir, "EPIC_100_validation.csv"))
        uids = np.arange(len(df)) + len(df_train)
    elif split == "evaluation" or split == "eval":
        df_train = pd.read_csv(os.path.join(adir, "EPIC_100_train.csv"))
        df = pd.read_csv(os.path.join(adir, "EPIC_100_validation.csv"))
        df["uid"] = np.arange(len(df)) + len(df_train)
        with open(C.eval_label_path("ek100"), "rb") as f:
            eval_uids = set(pickle.load(f).keys())
        df = df.loc[df["uid"].isin(eval_uids)]
        uids = None
    elif split == "test":
        df_train = pd.read_csv(os.path.join(adir, "EPIC_100_train.csv"))
        df_val = pd.read_csv(os.path.join(adir, "EPIC_100_validation.csv"))
        df = pd.read_csv(os.path.join(adir, "EPIC_100_test_timestamps.csv"))
        uids = np.arange(len(df)) + len(df_train) + len(df_val)
    else:
        raise ValueError(f"split {split} not supported")

    df["start_time"] = df["start_timestamp"].map(timestr2sec)
    df["stop_time"] = df["stop_timestamp"].map(timestr2sec)
    if "uid" not in df and uids is not None:
        df["uid"] = uids

    if use_label_only and split in ("train", "validation"):
        with open(C.video_info_path("ek100")) as f:
            uids_label = json.load(f)
        df = df.loc[df["uid"].isin(uids_label)]

    if "test" not in split:
        df = _attach_action_classes(df, "ek100")
    return df


def get_ek55_annotation(split: str, use_label_only: bool = True) -> pd.DataFrame:
    adir = C.annotation_dir("ek55")
    if split in ("train", "validation"):
        df = pd.read_csv(os.path.join(adir, "EPIC_train_action_labels.csv"))
        if use_label_only:
            with open(C.video_info_path("ek55")) as f:
                uids_label = json.load(f)
            df = df.loc[df["uid"].isin(uids_label)]
        df_train_r, df_val_r = read_rulstm_splits(C.rulstm_annotation_dir("ek55"))
        keep = df_train_r if split == "train" else df_val_r
        df = df.loc[df["uid"].isin(keep["uid"].values.tolist())]
    elif split in ("eval", "evaluation"):
        df = pd.read_csv(os.path.join(adir, "EPIC_train_action_labels.csv"))
        with open(C.eval_label_path("ek55"), "rb") as f:
            eval_uids = set(pickle.load(f).keys())
        df = df.loc[df["uid"].isin(eval_uids)]
    elif split in ("test_s1", "test_s2"):
        df = pd.read_csv(os.path.join(adir, f"EPIC_{split}_timestamps.csv"))
    else:
        raise ValueError(f"split {split} not supported")

    df["start_time"] = df["start_timestamp"].map(timestr2sec)
    df["stop_time"] = df["stop_timestamp"].map(timestr2sec)
    if "test" not in split:
        df = _attach_action_classes(df, "ek55")
    return df


def get_annotation(ek_version: str, split: str, use_label_only: bool = True) -> pd.DataFrame:
    if ek_version == "ek100":
        return get_ek100_annotation(split, use_label_only)
    if ek_version == "ek55":
        return get_ek55_annotation(split, use_label_only)
    raise ValueError(ek_version)
