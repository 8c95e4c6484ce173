"""Minimal faiss substitute for executing the REFERENCE CLI in tests.

Implements exactly the API surface memo_cli.py touches (IndexHNSWFlat,
IndexIDMap2, read/write_index, vector_to_array) with EXACT brute-force
squared-L2 search — on the tiny golden corpora the reference's HNSW is
also exact, so the reference's observable behavior is reproduced.
Ties sort stably (insertion order), which after a reindex equals id
order; real FAISS leaves tie order unspecified.
"""

from __future__ import annotations

import pickle

import numpy as np


class _HNSWParams:
    def __init__(self):
        self.efConstruction = 40
        self.efSearch = 16


class IndexHNSWFlat:
    def __init__(self, d: int, M: int = 32):
        self.d = d
        self.hnsw = _HNSWParams()
        self.ntotal = 0


class IndexIDMap2:
    def __init__(self, base):
        self.d = base.d
        self._vecs = np.zeros((0, self.d), dtype=np.float32)
        self._ids = np.zeros((0,), dtype=np.int64)

    @property
    def ntotal(self) -> int:
        return int(self._ids.shape[0])

    @property
    def id_map(self):
        return self._ids

    def add_with_ids(self, vecs, ids) -> None:
        vecs = np.asarray(vecs, dtype=np.float32).reshape(-1, self.d)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        self._vecs = np.concatenate([self._vecs, vecs], axis=0)
        self._ids = np.concatenate([self._ids, ids], axis=0)

    def search(self, queries, k: int):
        queries = np.asarray(queries, dtype=np.float32).reshape(-1, self.d)
        nq = queries.shape[0]
        scores = np.full((nq, k), np.inf, dtype=np.float32)
        ids = np.full((nq, k), -1, dtype=np.int64)
        for qi in range(nq):
            if self.ntotal == 0:
                continue
            d2 = ((self._vecs - queries[qi][None, :]) ** 2).sum(axis=1)
            order = np.argsort(d2, kind="stable")[:k]
            scores[qi, : len(order)] = d2[order]
            ids[qi, : len(order)] = self._ids[order]
        return scores, ids


def vector_to_array(x):
    return np.asarray(x)


def write_index(index, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(
            {"d": index.d, "vecs": index._vecs, "ids": index._ids}, f
        )


def read_index(path: str):
    with open(path, "rb") as f:
        state = pickle.load(f)
    idx = IndexIDMap2(IndexHNSWFlat(state["d"]))
    idx._vecs = state["vecs"]
    idx._ids = state["ids"]
    return idx
