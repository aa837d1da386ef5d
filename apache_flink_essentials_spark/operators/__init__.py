"""Operator library — one module per SURVEY §2 capability group.

transform.py   map/flatMap/filter/keyBy/reduce/process  (§2.2)
windows.py     tumbling/sliding/session/count windows   (§2.4)
joins.py       union/window-join/interval-join/connect  (§2.3)
dedup.py       exact + MinHash/SimHash near-dedup       (§2.10)
text.py        text analysis: lang-ID, quality, tokens  (§2.10)
vector.py      cosine similarity / ANN top-k            (§2.10)
multimodal.py  binary media columns + pandas-UDF plumbing (§2.10)
"""
