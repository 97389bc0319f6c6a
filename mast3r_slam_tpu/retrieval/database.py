"""Retrieval database: incremental ASMK index over keyframes for
loop-closure proposals and relocalization.

Capability parity with `/root/reference/mast3r_slam/retrieval_database.py`:
``update(frame, ...)`` preps top-k attention features from the cached
encoder tokens, queries the incremental IVF for the top-k most similar
keyframes above a score threshold, and optionally adds the frame to the
index afterwards (the add_after_query=False path is how relocalization
peeks without committing, main.py:46-51).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .asmk import ASMKKernel, Codebook, IVF
from .model import RetrievalParams, prep_features


class RetrievalDatabase:
    """Pipeline-facing retrieval interface (same signature as
    pipeline.NullRetrieval)."""

    def __init__(self, params: RetrievalParams, codebook: Codebook,
                 nfeat: int = 300, alpha: float = 3.0,
                 similarity_threshold: float = 0.0,
                 query_ma: int = 5, build_ma: int = 1):
        self.params = params
        self.codebook = codebook
        self.kernel = ASMKKernel(codebook, binary=True)
        self.ivf = IVF(codebook.size)
        self.nfeat = nfeat
        self.alpha = alpha
        self.similarity_threshold = similarity_threshold
        self.query_ma = query_ma   # multiple assignment (query: 5)
        self.build_ma = build_ma   # multiple assignment (build: 1)
        self.kf_counter = 0
        self.kf_ids: list[int] = []

    @classmethod
    def from_checkpoint(cls, retrieval_ckpt: str, codebook_pkl: str,
                        **kw) -> "RetrievalDatabase":
        """Load the published retrieval head + codebook
        (reference processor.py:70-99)."""
        params = RetrievalParams.from_torch_checkpoint(retrieval_ckpt)
        codebook = Codebook.load(codebook_pkl)
        return cls(params, codebook, **kw)

    # ------------------------------------------------------------------

    def _features(self, frame) -> np.ndarray:
        feat = frame.feat[None]  # (1, N, D)
        top = prep_features(self.params, feat, self.nfeat,
                            residual=bool(self.params.residual))
        return np.asarray(top[0], np.float32)

    def _similarity(self, qvec, vecs, image_ids):
        return self.kernel.similarity(
            qvec, vecs, image_ids, alpha=self.alpha,
            similarity_threshold=self.similarity_threshold,
        )

    def update(self, frame, arena=None, add_after_query: bool = True,
               k: int = 3, min_thresh: float = 0.0):
        """Query + optional insert (retrieval_database.py:43-72).
        Returns the list of matching keyframe indices (positions in the
        keyframe arena ordering)."""
        feat = self._features(frame)

        topk_image_inds: list[int] = []
        query_words = None
        if self.kf_counter > 0:
            query_words = self.codebook.quantize(feat, self.query_ma)
            ades, word_ids = self.kernel.aggregate_image(feat, query_words)
            if self.kernel.binary:
                # one flattened XOR+popcount instead of a ~U-iteration
                # Python loop over near-empty posting lists (asmk.py
                # search_packed)
                ranks, ranked_scores = self.ivf.search_packed(
                    ades, word_ids, self.codebook.dim, alpha=self.alpha,
                    similarity_threshold=self.similarity_threshold,
                    topk=None,
                )
            else:
                ranks, ranked_scores = self.ivf.search(
                    ades, word_ids, self._similarity, topk=None
                )
            scores = np.empty_like(ranked_scores)
            scores[ranks] = ranked_scores
            kk = min(k, self.ivf.n_images)
            order = np.argsort(-scores)[:kk]
            valid = scores[order] > min_thresh
            topk_image_inds = [int(i) for i in order[valid]]

        if add_after_query:
            self._add(feat, query_words)
        return topk_image_inds

    def _add(self, feat: np.ndarray, query_words: Optional[np.ndarray]):
        if query_words is not None:
            words = query_words[:, : self.build_ma]
        else:
            words = self.codebook.quantize(feat, self.build_ma)
        ades, word_ids = self.kernel.aggregate_image(feat, words)
        imids = np.full(word_ids.shape[0], self.kf_counter, np.int64)
        self.ivf.add(ades, word_ids, imids)
        self.kf_ids.append(self.kf_counter)
        self.kf_counter += 1
