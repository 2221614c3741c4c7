"""Recreate the 10x scale-check dataset (/tmp/sfx10) from sf0.1: id-shifted
copies, same schemas — 10x documents/events/lineitem, 4x embeddings (the
exact-regime O(n^2) half bounds the useful factor). Non-scaled dims are
copied as-is. Usage: ``python3 tools/make_sfx10.py`` then
``SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_SCALING=0 python3 bench.py``
(OPTIMIZATION_r07.md "Holds at larger scale"). /tmp is wiped on sandbox
restarts — rerun this to reproduce the scale check; the id shifts are
deterministic, so the dataset is identical every time. Note the duplication
artifact: every document has K exact copies, so near-dup candidate counts
(minhash/ngram) grow ~K^2 per bucket — expected, disclosed in the round
doc; a naturally-grown corpus would not."""
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
FACTORS = {"documents": 10, "events": 10, "lineitem": 10, "embeddings": 4}
ID_SHIFT = {
    "documents": ("doc_id", 1_000_000),
    "events": ("event_id", 10_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
    "embeddings": ("vec_id", 1_000_000),
}

shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)
for f in sorted(os.listdir(SRC)):
    if not f.endswith(".parquet"):
        continue
    name = f[:-8]
    t = pq.read_table(f"{SRC}/{f}")
    k = FACTORS.get(name, 1)
    if k == 1:
        pq.write_table(t, f"{DST}/{f}")
        print(name, t.num_rows)
        continue
    copies = []
    col, shift = ID_SHIFT[name]
    for i in range(k):
        c = t
        if i:
            idx = c.schema.get_field_index(col)
            c = c.set_column(idx, col, pc.add(c.column(col), i * shift))
            if name == "events":
                ui = c.schema.get_field_index("user_id")
                c = c.set_column(ui, "user_id", pc.add(c.column("user_id"), i * 100_000))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{DST}/{f}")
    print(name, out.num_rows)
open(f"{DST}/_DONE", "w").close()
print("done ->", DST)
