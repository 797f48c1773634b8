"""SubRip (.srt) / WebVTT (.vtt) subtitle parsing — the transcript
leg of a speech/video training corpus (caption text + time
alignment is what ASR distillation, video-caption pairing, and
dub-alignment pipelines consume).

Both formats are blank-line-separated cue blocks around a timestamp
line (``HH:MM:SS,mmm --> HH:MM:SS,mmm`` for SRT; WebVTT uses ``.``
for the millisecond separator, allows the hour field to be absent,
prefixes the file with a ``WEBVTT`` header block, and may put an
optional cue-identifier line above the timestamps). That is pure
string structure, so the whole parse stays JVM-side: split on blank
lines → ``posexplode`` → one combined regexp for both endpoint
timestamps → integer-millisecond arithmetic. Non-cue blocks (the
WEBVTT header, ``NOTE``/``STYLE`` blocks, stray numbering garbage)
simply have no ``-->`` match and are filtered — never an error.
Zero UDFs; one-to-many expansion only (no shuffle), scan-speed over
caption corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One endpoint: optional hours (VTT short form), then MM:SS and a
# 3-digit millisecond field behind ',' (SRT) or '.' (VTT).
_TS = r"(?:(\d{1,2}):)?(\d{2}):(\d{2})[.,](\d{3})"
_CUE = _TS + r"[ \t]*-->[ \t]*" + _TS


def parse_subtitles(
    df: DataFrame, text_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Explode subtitle documents into typed cue rows:
    ``(id_col, cue_idx, start_ms, end_ms, dur_ms, text, n_lines)``.

    ``cue_idx`` is the 0-based position among the document's VALID
    cue blocks (not SRT's declared counter — real files renumber
    badly); ``text`` is the payload lines after the timestamp line
    re-joined with ``\\n``; ``n_lines`` counts them. Blocks without
    a ``-->`` timestamp (headers, NOTEs) drop out; a cue whose
    payload is empty survives with ``text = ''`` and ``n_lines =
    0``.
    """
    arr = F.split(F.col(text_col), r"\r?\n[ \t]*\r?\n+")
    valid = F.filter(
        arr, lambda b: F.regexp_extract(b, _CUE, 0) != ""
    )
    # filtering INSIDE the array (before the explode) keeps cue_idx
    # dense straight out of posexplode — no per-document row_number
    # window, hence no shuffle anywhere in the op.
    cues = df.select(
        F.col(id_col),
        F.posexplode(valid).alias("cue_idx", "_block"),
    )

    def _ms(base: int):
        h = F.regexp_extract(F.col("_block"), _CUE, base + 1)
        h = F.when(h == "", F.lit("0")).otherwise(h).cast("long")
        m = F.regexp_extract(F.col("_block"), _CUE, base + 2)
        s = F.regexp_extract(F.col("_block"), _CUE, base + 3)
        ms = F.regexp_extract(F.col("_block"), _CUE, base + 4)
        return (
            (h * 3600 + m.cast("long") * 60 + s.cast("long")) * 1000
            + ms.cast("long")
        )

    start_ms = _ms(0)
    end_ms = _ms(4)
    # payload = everything after the timestamp LINE; the leading
    # block part (SRT counter / VTT cue id + the timestamp line
    # itself, wherever it sits) goes.
    payload = F.regexp_replace(
        F.col("_block"), r"(?s)^.*?" + _CUE + r"[^\n]*\n?", ""
    )
    payload = F.regexp_replace(payload, r"\r", "")
    return cues.select(
        F.col(id_col),
        F.col("cue_idx"),
        start_ms.alias("start_ms"),
        end_ms.alias("end_ms"),
        (end_ms - start_ms).alias("dur_ms"),
        payload.alias("text"),
        F.when(payload == "", F.lit(0))
        .otherwise(F.size(F.split(payload, r"\n")))
        .cast("int")
        .alias("n_lines"),
    )
