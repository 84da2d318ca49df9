"""Engine-wide constants.

Values mirror the reference's resource caps and chunking defaults
(pmwangi5/pdf-extractor, /root/reference/api.py:85-121) so output is
comparable chunk-for-chunk.  Everything here is a plain module constant —
no env lookups at import time, so pandas UDF workers pick up identical
values to the driver.
"""

# --- Chunking (reference: api.py:948, api.py:1303) -------------------------
CHUNK_SIZE = 1500          # target chars per chunk
CHUNK_OVERLAP = 400        # chars carried into the next chunk

# --- Resource caps (reference: api.py:85-90, api.py:1107-1109) --------------
MAX_FILE_SIZE = 200 * 1024 * 1024   # per-turn raw payload cap (bytes analog)
# DELIBERATE DEVIATION from the reference's 100-byte floor (api.py:86):
# that floor rejects truncated PDF *files*, but transcript *turns* are
# routinely shorter than 100 chars ("ok", tool acks) and must still parse.
# The spirit of the check (reject empty payloads) is kept at 1 char.
MIN_FILE_SIZE = 1
MAX_TURNS_PER_CONV = 10_000         # = MAX_PDF_PAGES; longer convs are rejected
MAX_CHUNKS_PER_CONV = 10_000        # = MAX_CHUNKS_PER_PDF
MAX_TEXT_LENGTH = 100_000           # sanitize truncation cap (= MAX_CHUNK_LENGTH)

# --- Unit splitting thresholds (reference: api.py:872-940) ------------------
HEADER_MAX_CHARS = 100     # short-block header classifier bound
LIST_SPLIT_CHARS = 1500    # bullet/numbered lists longer than this are split
PARA_SPLIT_CHARS = 1200    # paragraphs longer than this are sentence-split
SENTENCE_PACK_CHARS = 900  # repacked sentence-unit target

# --- Virtual page geometry (this engine's adapter; see core/layout.py) ------
# The reference reads positioned words from pdfplumber.  Transcript turns
# carry flat text, so we synthesise positions on a fixed character grid:
# one text column ≈ one PDF column, one text line ≈ one PDF line.
CHAR_WIDTH_PX = 1.0        # px per character cell
LINE_HEIGHT_PX = 12.0      # px per text line
PAGE_X_MARGIN = 8.0
PAGE_Y_MARGIN = 10.0
PAGE_BOTTOM_PAD = 30.0     # keeps body text out of the 12 px footer band
FOOTER_BAND_PX = 12.0      # reference: pdf_extractor.py:295

# Column detection (reference: pdf_extractor.py:82-84)
COL_BUCKET_PX = 5
COL_MIN_GAP_PX = 5
COL_MIN_WIDTH_PX = 50
LINE_Y_TOLERANCE = 4.0     # reference: pdf_extractor.py:150
HEADER_BAND_PT = 8.0       # reference: pdf_extractor.py:219

# --- Embeddings (reference: vector(1536), DB_ST_2.md:80-86) ------------------
EMBED_DIM = 1536
# Schema-version flag: False = array<float> (v1, reference-shaped, default);
# True = packed little-endian float32 binary (v2) — same bytes, no
# per-element Arrow offsets/list encoding, ~30% lighter embed+sink tail.
# Readers use operators.enrich.unpack_embeddings (or np.frombuffer).
EMBED_PACKED = False

# --- Spark execution defaults ------------------------------------------------
DEFAULT_SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS_PER_BATCH = 2_000   # turns per Arrow batch into pandas UDFs
SALT_BUCKETS = 8                      # salting fan-out for skewed stage-1 work
CHECKPOINT_BUCKETS = 16               # conv-hash buckets for resumable commits
