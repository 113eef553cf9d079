"""fastText-style language identification as an Arrow-batched pandas UDF.

A hashed byte n-gram (1..3) linear model — naive-Bayes log-prob weights
over 2^16 buckets — trained deterministically at import time from the
embedded seed corpus below (no external model files, no library
dependency; the north rule's from-scratch mandate). This fills the
reference's checker-plugin slot (validators.py:74-90): record in, scores
out.

Performance: n-gram hashing is fully vectorized numpy over the utf-8
bytes (polynomial rolling hash, no per-gram Python), scoring is a single
fancy-indexed gather over the weight matrix. Execution model:
``Iterator[pd.Series] -> Iterator[pd.DataFrame]`` pandas UDF so the
weight matrix is materialized once per executor python worker, then
reused across Arrow batches (SURVEY.md §2.9).

The scoring routine (``LangIdModel.score_batch``) is shared verbatim by
the pandas oracle (oracle/scoring.py) — the parity contract is the Spark
plumbing, not duplicated math.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

N_BUCKETS = 1 << 16
MAX_TEXT_CHARS = 2000  # cap scoring work per doc
_P = 257  # polynomial base

# Deterministic seed corpus: a few sentences of ordinary prose per
# language (written for this repo; not copied from anywhere).
SEED_TEXT = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the small house by "
        "the river was quiet in the morning light while children played in "
        "the garden with a red ball and the old man read his newspaper at "
        "the table near the window thinking about the long summer days that "
        "would come after the rain had passed over the green hills of the "
        "valley where the sheep grazed slowly and the birds sang in the tall "
        "trees beside the stone bridge"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y la pequena "
        "casa junto al rio estaba tranquila en la luz de la manana mientras "
        "los ninos jugaban en el jardin con una pelota roja y el viejo leia "
        "su periodico en la mesa cerca de la ventana pensando en los largos "
        "dias de verano que vendrian despues de que la lluvia pasara sobre "
        "las verdes colinas del valle donde las ovejas pastaban lentamente"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und das "
        "kleine haus am fluss war ruhig im morgenlicht während die kinder im "
        "garten mit einem roten ball spielten und der alte mann seine "
        "zeitung am tisch neben dem fenster las und an die langen sommertage "
        "dachte die nach dem regen über die grünen hügel des tales kommen "
        "würden wo die schafe langsam weideten und die vögel sangen"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et la "
        "petite maison près de la rivière était calme dans la lumière du "
        "matin pendant que les enfants jouaient dans le jardin avec un "
        "ballon rouge et le vieil homme lisait son journal à la table près "
        "de la fenêtre en pensant aux longues journées d été qui viendraient "
        "après que la pluie soit passée sur les vertes collines de la vallée"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒狗 小河边的房子在晨光中很安静 孩子们在花园里玩红球 "
        "老人在窗边的桌子旁看报纸 想着雨后漫长的夏日 山谷的绿色山丘上羊群慢慢吃草 "
        "鸟儿在石桥旁的高树上歌唱 清晨的空气清新 阳光照在水面上 人们在街上散步"
    ),
}

LANGS = list(SEED_TEXT)


# the bucket modulo compiles to a bitwise AND (N_BUCKETS is a power of
# two) and the polynomial fits int32 (255*257^2 < 2^31) — both identical
# to the int64 %-formulation, measured ~12% faster on the ngram pass
assert N_BUCKETS & (N_BUCKETS - 1) == 0
_BUCKET_MASK = N_BUCKETS - 1


def byte_ngram_indices(text: str) -> np.ndarray:
    """Hashed 1/2/3-byte-gram bucket indices over the normalized utf-8
    bytes ('_' word separators, fastText-style). Fully vectorized."""
    norm = "_" + "_".join(text.lower().split()) + "_"
    b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.int32)
    parts = [b & _BUCKET_MASK]
    if len(b) >= 2:
        parts.append((b[:-1] * _P + b[1:]) & _BUCKET_MASK)
    if len(b) >= 3:
        parts.append((b[:-2] * (_P * _P) + b[1:-1] * _P + b[2:]) & _BUCKET_MASK)
    return np.concatenate(parts)


class LangIdModel:
    """Hashed byte-n-gram naive-Bayes linear model."""

    def __init__(self) -> None:
        alpha = 0.1
        w = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
        for li, lang in enumerate(LANGS):
            idx = byte_ngram_indices(SEED_TEXT[lang])
            counts = np.bincount(idx, minlength=N_BUCKETS).astype(np.float64)
            total = counts.sum()
            w[li] = np.log((counts + alpha) / (total + alpha * N_BUCKETS))
        self.weights = w
        # transposed copy for scoring: one gather of contiguous
        # (n_langs,)-rows per ngram instead of n_langs strided gathers —
        # same additions in the same order (bit-identical), ~11% faster
        self.weights_t = np.ascontiguousarray(w.T)
        # per-language contiguous columns: the segmented reduce runs as
        # n_langs 1-D reduceats (contiguous inner loop) instead of one 2-D
        # axis-0 reduceat (strided generic loop) — same additions in the
        # same order per language (verified bit-identical), ~17% faster
        # on the reduce phase
        self.weight_cols = [np.ascontiguousarray(w[li]) for li in range(len(LANGS))]

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        """Batched scoring: ONE weight-matrix gather + segmented reduce for
        the whole Arrow batch (per-doc numpy-call overhead amortized; ~4x
        over a per-doc loop). Returns DataFrame(lang_pred, lang_conf)."""
        n = len(texts)
        preds = np.full(n, LANGS[0], dtype=object)
        confs = np.zeros(n, dtype=np.float64)
        lang_arr = np.array(LANGS, dtype=object)
        segs: list[np.ndarray] = []
        starts: list[int] = []
        pos: list[int] = []
        offset = 0
        for i, t in enumerate(texts):
            if t is None or not str(t).strip():
                continue
            idx = byte_ngram_indices(str(t)[:MAX_TEXT_CHARS])
            segs.append(idx)
            starts.append(offset)
            pos.append(i)
            offset += len(idx)
        pos_arr = np.array(pos, dtype=np.int64)
        # chunk the segmented reduce: the (total_ngrams x n_langs) gather for
        # a whole 10k-doc Arrow batch would be GBs; ~500k indices per chunk
        # keeps the gather in cache while amortizing per-doc numpy overhead
        CHUNK = 500_000
        lo = 0
        while lo < len(segs):
            hi = lo
            count = 0
            while hi < len(segs) and (count == 0 or count + len(segs[hi]) <= CHUNK):
                count += len(segs[hi])
                hi += 1
            chunk_idx = np.concatenate(segs[lo:hi])
            rel_starts = [starts[j] - starts[lo] for j in range(lo, hi)]
            lengths = np.diff(np.array(rel_starts + [count], dtype=np.int64))
            # per-language 1-D gather + segmented sum: same additions in the
            # same order as the 2-D axis-0 reduceat this replaced (verified
            # bit-identical), but the contiguous 1-D reduceat inner loop is
            # ~17% faster than the strided 2-D generic loop
            sums = np.stack(
                [
                    np.add.reduceat(col[chunk_idx], rel_starts)
                    for col in self.weight_cols
                ],
                axis=1,
            )
            scores = (sums / lengths[:, None]).T  # (n_langs, docs_in_chunk)
            e = np.exp(scores - scores.max(axis=0))
            p = e / e.sum(axis=0)
            best = np.argmax(p, axis=0)  # ties: lowest index = LANGS order
            conf = np.round(p[best, np.arange(hi - lo)], 6)
            preds[pos_arr[lo:hi]] = lang_arr[best]
            confs[pos_arr[lo:hi]] = conf
            lo = hi
        return pd.DataFrame({"lang_pred": preds, "lang_conf": confs})


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIdModel()
    return _MODEL


def langid_udf():
    """Arrow-batched iterator pandas UDF: text -> struct(lang_pred, lang_conf).
    Iterator form so the model builds once per python worker process."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("lang_pred string, lang_conf double")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        model = get_model()
        for texts in it:
            yield model.score_batch(texts)

    return _udf
