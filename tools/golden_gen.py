#!/usr/bin/env python3
"""Decision-parity golden generator: run the REFERENCE ICON implementation
(/root/reference, jingcshi/ICON) with deterministic stub models that are
bit-compatible twins of the Scala stubs (graft.models), and export its
placement decisions as JSON goldens for GoldenSpec.

The reference treats its models as opaque callables (README.md:29-39), so
stubbing them is the sanctioned seam. nltk (tokenset) and faiss (vector
index) are not installed; both are injected with deterministic equivalents
that match the Scala engine's canonical implementations:
  - tokenset  -> graft.lexical.Tokenset (lowercase, [^a-z0-9]+ split,
                 stopword drop, plural stem, order-preserving dedupe)
  - FaissVectorStore -> exact inner-product top-k, ties by id asc
Decisions depend only on score *comparisons*, which these twins reproduce
exactly (integer-count embeddings, rational containment scores).

Usage: python3 tools/golden_gen.py <out_dir>
"""
import json
import sys
import types

import numpy as np

# ---------------------------------------------------------------- stubs ---

STOPWORDS = {"a", "an", "the", "and", "or", "of", "for", "to", "in", "on",
             "with", "by", "at", "from", "as", "is", "are", "other"}


def stem(tok):
    if len(tok) > 4 and tok.endswith("ies"):
        return tok[:-3] + "y"
    if (len(tok) > 3 and tok.endswith("s") and not tok.endswith("ss")
            and not tok.endswith("us") and not tok.endswith("is")):
        return tok[:-1]
    return tok


def tokenset(text):
    """Twin of graft.lexical.Tokenset.tokens."""
    import re
    if text is None:
        return []
    out = []
    for seg in text.split(" > "):
        for raw in re.split(r"[^a-z0-9]+", seg.lower()):
            if raw and raw not in STOPWORDS:
                t = stem(raw)
                if t not in out:
                    out.append(t)
    return out


def fnv1a64(s):
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def embed_one(label, dim=64):
    """Twin of graft.models.HashNgramEmbedder."""
    counts = np.zeros(dim, dtype=np.int64)
    s = "^" + (label or "").lower() + "$"
    for i in range(len(s) - 2):
        h = fnv1a64(s[i:i + 3])
        idx = h % dim
        sign = 1 if ((h >> 32) & 1) == 0 else -1
        counts[idx] += sign
    norm = float(np.sqrt(float((counts.astype(np.float64) ** 2).sum())))
    out = np.zeros(dim, dtype=np.float32)
    if norm > 0:
        out = (counts.astype(np.float64) / norm).astype(np.float32)
    return out


class EmbModel:
    def __call__(self, labels):
        if isinstance(labels, str):
            labels = [labels]
        return np.stack([embed_one(l) for l in labels])


class SubModel:
    """Twin of graft.models.TokenContainmentScorer (squared containment)."""

    def __init__(self, hypernyms=None):
        self.hypernyms = hypernyms or {}

    def _covers(self, t, ts):
        return t in ts or any(t in self.hypernyms.get(s, ()) for s in ts)

    def _one(self, sub, sup):
        ts = set(tokenset(sub))
        tp = tokenset(sup)
        if not tp:
            return 0.0
        f = sum(1 for t in tp if self._covers(t, ts)) / len(tp)
        return f * f

    def __call__(self, sub, sup):
        if isinstance(sub, str):
            return np.float64(self._one(sub, sup))
        return np.array([self._one(a, b) for a, b in zip(sub, sup)], dtype=np.float64)


class GenModel:
    """Twin of graft.models.CommonTokenGenerator."""

    def __call__(self, labels):
        seqs = [tokenset(l) for l in labels]
        if not seqs:
            return ""
        common = [t for t in seqs[0] if all(t in s for s in seqs[1:])]
        if common:
            return " ".join(common)
        seen = []
        for s in seqs:
            for t in s:
                if t not in seen:
                    seen.append(t)
        return " ".join(seen)


class StubVectorStore:
    """Twin of graft.retrieve.VectorIndex (exact IP top-k, ties by id asc),
    drop-in for FaissVectorStore (reference only ever uses exhaustive)."""

    def __init__(self, vectors, concepts, **kwargs):
        self.vectors = np.asarray(vectors, dtype=np.float32)
        self.ids = list(concepts)
        self.concepts = set(concepts)
        self.pos = {c: i for i, c in enumerate(self.ids)}
        self.ntotal = len(self.ids)

    def search(self, query, k=5, subset=None, nprobe=None, exhaustive=False):
        q = np.asarray(query, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        cand = [i for i, c in enumerate(self.ids)
                if subset is None or c in set(subset)]
        D, I = [], []
        for row in q:
            scores = [(float(np.dot(row.astype(np.float64),
                                    self.vectors[i].astype(np.float64))),
                       self.ids[i]) for i in cand]
            scores.sort(key=lambda t: (-t[0], t[1]))
            top = scores[:k]
            D.append([s for s, _ in top])
            I.append([i for _, i in top])
        D, I = np.array(D), np.array(I)
        # reference quirk: reconstruct(id) returns shape (1,d), so
        # outer_loop's search would get nested (1,k) indices and crash at
        # icon.py:428 (`non_seed.remove(seed)`) even with real FAISS.
        # The evidently intended semantics is a flat top-k list — flatten
        # single-row queries (matches the Scala engine's outerLoop).
        if single or len(q) == 1:
            return D[0], I[0]
        return D, I

    def reconstruct(self, ids):
        if isinstance(ids, (list, tuple)):
            return np.stack([self.vectors[self.pos[i]] for i in ids])
        return self.vectors[self.pos[ids]][None]

    def add(self, vectors, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
            if vectors.ndim == 1:
                vectors = vectors[None]
        self.vectors = np.concatenate([self.vectors, np.asarray(vectors, np.float32)])
        for c in ids:
            self.pos[c] = len(self.ids)
            self.ids.append(c)
        self.concepts |= set(ids)
        self.ntotal += len(ids)

    def delete(self, ids):
        raise NotImplementedError


def install_stub_modules():
    # fake tqdm (progress bars off anyway, but icon.py imports it)
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_auto = types.ModuleType("tqdm.auto")

    class _FakeTqdm:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def update(self, *a, **k):
            pass

        def reset(self, *a, **k):
            pass

        def set_description(self, *a, **k):
            pass

    tqdm_auto.tqdm = _FakeTqdm
    tqdm_mod.auto = tqdm_auto
    sys.modules["tqdm"] = tqdm_mod
    sys.modules["tqdm.auto"] = tqdm_auto

    # fake icon.utils.tokenset_utils (nltk-free) — must be registered before
    # icon.core.icon is imported
    ts_mod = types.ModuleType("icon.utils.tokenset_utils")
    ts_mod.tokenset = tokenset
    sys.modules["icon.utils.tokenset_utils"] = ts_mod

    # fake icon.utils.vector_index (faiss-free)
    vi_mod = types.ModuleType("icon.utils.vector_index")
    vi_mod.FaissVectorStore = StubVectorStore
    sys.modules["icon.utils.vector_index"] = vi_mod


# ------------------------------------------------------------ scenarios ---

DOMAIN_HYPERNYMS = {
    **{w: ("operation",) for w in
       ["join", "scan", "sort", "merge", "agg", "filter", "group", "window"]},
    **{w: ("structure",) for w in
       ["table", "row", "column", "vector", "hash", "key", "value", "line", "part"]},
    **{w: ("workload",) for w in ["query", "batch", "stream", "data"]},
}


def animal5():
    return {"nodes": [{"id": 0, "label": "Root Concept"}, {"id": 1, "label": "Animal"},
                      {"id": 2, "label": "Mammal"}, {"id": 3, "label": "Bird"},
                      {"id": 4, "label": "Dog"}],
            "edges": [{"src": 1, "tgt": 0, "label": "original"},
                      {"src": 2, "tgt": 1, "label": "original"},
                      {"src": 3, "tgt": 1, "label": "original"},
                      {"src": 4, "tgt": 2, "label": "original"}]}


def decisions_to_json(logs):
    out = []
    for label, d in logs.items():
        eqv = d.get("equivalent") or {}
        out.append({
            "label": label,
            "eqv": [{"node": int(k), "score": float(v)} for k, v in eqv.items()],
            "sup": sorted([{"node": int(k), "p": float(v)}
                           for k, v in (d.get("superclass") or {}).items()],
                          key=lambda x: x["node"]),
            "sub": sorted([{"node": int(k), "p": float(v)}
                           for k, v in (d.get("subclass") or {}).items()],
                          key=lambda x: x["node"]),
        })
    return out


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/goldens"
    install_stub_modules()
    sys.path.insert(0, "/root/reference/src")
    import tempfile, os
    from icon.core.icon import ICON
    from icon.core.taxonomy import from_json

    goldens = {}

    def load(obj):
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(obj, f)
            path = f.name
        t = from_json(path)
        os.unlink(path)
        return t

    # --- scenario 1: manual mode, explicit bases, animal5 -----------------
    taxo = load(animal5())
    inputs = ["Poodle Dog", "Small Mammal", "dogs", "Wild Bird", "Sea Creature",
              "Animal Kingdom", "Bird Mammal"]
    bases = [[4], [2], [2], [3], [1], [1], [2, 3]]
    icon = ICON(data=taxo, emb_model=EmbModel(), gen_model=GenModel(),
                sub_model=SubModel(), mode="manual", input_concepts=inputs,
                manual_concept_bases=bases, do_update=True, logging=False)
    result = icon.run()
    goldens["manual_animal5"] = {
        "taxonomy": animal5(),
        "inputs": inputs, "bases": bases,
        "decisions": decisions_to_json(icon._status.logs or {}),
    }
    # re-run with do_update=False to capture pure decisions
    icon2 = ICON(data=load(animal5()), emb_model=EmbModel(), gen_model=GenModel(),
                 sub_model=SubModel(), mode="manual", input_concepts=inputs,
                 manual_concept_bases=bases, do_update=False, logging=False)
    logs = icon2.run()
    goldens["manual_animal5"]["decisions"] = decisions_to_json(logs)
    goldens["manual_animal5"]["final_edges"] = sorted(
        [[int(u), int(v), result.edges[u, v].get("label", "")]
         for u, v in result.edges])
    goldens["manual_animal5"]["final_nodes"] = sorted(
        [[int(n), result.nodes[n].get("label", "")] for n in result.nodes])

    # --- scenario 2: google product taxonomy sample, manual ---------------
    gtaxo = from_json("/root/reference/data/raw/google/google.json")
    # deterministic sub-sample for tractable goldens: BFS from root, 300 nodes
    from collections import deque
    keep = []
    q = deque([0])
    seen = {0}
    while q and len(keep) < 300:
        n = q.popleft()
        keep.append(n)
        for c in sorted(gtaxo.get_children(n)):
            if c not in seen:
                seen.add(c)
                q.append(c)
    keepset = set(keep)
    gsub = {"nodes": [{"id": int(n), "label": gtaxo.get_label(n)} for n in sorted(keep)],
            "edges": [{"src": int(u), "tgt": int(v),
                       "label": gtaxo.edges[u, v].get("label", "original")}
                      for u, v in gtaxo.edges
                      if u in keepset and v in keepset]}
    taxo_g = load(gsub)
    labels_pool = [gtaxo.get_label(n) for n in sorted(keep)[1:]]
    inputs_g = []
    bases_g = []
    nodes_sorted = sorted(keep)[1:]
    for i in range(0, 40):
        n = nodes_sorted[(i * 7) % len(nodes_sorted)]
        lbl = gtaxo.get_label(n)
        inputs_g.append(lbl + "s" if not lbl.endswith("s") else lbl[:-1])
        parents = sorted(taxo_g.get_parents(n))
        bases_g.append([int(n)] + [int(p) for p in parents[:1]])
    icon_g = ICON(data=taxo_g, emb_model=EmbModel(), gen_model=GenModel(),
                  sub_model=SubModel(), mode="manual", input_concepts=inputs_g,
                  manual_concept_bases=bases_g, do_update=False, logging=False)
    logs_g = icon_g.run()
    goldens["manual_google300"] = {
        "taxonomy": gsub, "inputs": inputs_g, "bases": bases_g,
        "decisions": decisions_to_json(logs_g),
    }

    # --- scenario 3: semiauto on google300 (generation + retrieval) -------
    taxo_s = load(gsub)
    # duplicate labels make the seed fall out of its own top-10 (a reference
    # crash path at icon.py:428) — pick leaf seeds with corpus-unique labels
    from collections import Counter
    label_freq = Counter(n["label"] for n in gsub["nodes"])
    seeds = [s for s in sorted(taxo_s.get_LCA([]))
             if label_freq[taxo_s.get_label(s)] == 1][:5]
    icon_s = ICON(data=taxo_s, emb_model=EmbModel(), gen_model=GenModel(),
                  sub_model=SubModel(), mode="semiauto",
                  semiauto_seeds=seeds, do_update=False, logging=False)
    logs_s = icon_s.run()
    goldens["semiauto_google300"] = {
        "taxonomy": gsub, "seeds": [int(s) for s in seeds],
        "decisions": decisions_to_json(logs_s),
    }

    # --- scenario 4: semiauto, generation unfiltered (more inner loops) ----
    taxo_s2 = load(gsub)
    icon_s2 = ICON(data=taxo_s2, emb_model=EmbModel(), gen_model=GenModel(),
                   sub_model=SubModel(), mode="semiauto",
                   semiauto_seeds=seeds, filter_subset=False,
                   do_update=False, logging=False)
    logs_s2 = icon_s2.run()
    goldens["semiauto_google300_nofilter"] = {
        "taxonomy": gsub, "seeds": [int(s) for s in seeds],
        "decisions": decisions_to_json(logs_s2),
    }

    # --- scenario 5: tolerance=1 + force paths on google300 ----------------
    # single-node bases: the reference's force_base_subsumptions path calls
    # get_LCA(base) on the cropped subtaxo and crashes when a base node was
    # reduced out of it — stay on the defined path
    taxo_t = load(gsub)
    bases_t = [[b[0]] for b in bases_g[:20]]
    icon_t = ICON(data=taxo_t, emb_model=EmbModel(), gen_model=GenModel(),
                  sub_model=SubModel(), mode="manual", input_concepts=inputs_g[:20],
                  manual_concept_bases=bases_t, tolerance=1,
                  force_base_subsumptions=True, force_prune=True,
                  do_update=False, logging=False)
    logs_t = icon_t.run()
    goldens["manual_google300_tolerance"] = {
        "taxonomy": gsub, "inputs": inputs_g[:20], "bases": bases_t,
        "config": {"tolerance": 1, "force_base_subsumptions": True, "force_prune": True},
        "decisions": decisions_to_json(logs_t),
    }

    # --- scenario 6: multi-equivalence resolution (duplicate labels) -------
    dup = {"nodes": [{"id": 0, "label": "Root Concept"},
                     {"id": 1, "label": "Shoes"}, {"id": 2, "label": "Apparel"},
                     {"id": 3, "label": "Shoe"}, {"id": 4, "label": "Running Shoes"},
                     {"id": 5, "label": "Footwear"}],
           "edges": [{"src": 1, "tgt": 0, "label": "original"},
                     {"src": 2, "tgt": 0, "label": "original"},
                     {"src": 3, "tgt": 2, "label": "original"},
                     {"src": 4, "tgt": 1, "label": "original"},
                     {"src": 5, "tgt": 0, "label": "original"}]}
    taxo_d = load(dup)
    inputs_d = ["shoes", "running shoe", "footwear shoes"]
    bases_d = [[1, 3], [4], [1, 5]]
    icon_d = ICON(data=taxo_d, emb_model=EmbModel(), gen_model=GenModel(),
                  sub_model=SubModel(), mode="manual", input_concepts=inputs_d,
                  manual_concept_bases=bases_d, do_update=False, logging=False)
    logs_d = icon_d.run()
    goldens["manual_multieqv"] = {
        "taxonomy": dup, "inputs": inputs_d, "bases": bases_d,
        "decisions": decisions_to_json(logs_d),
    }

    # --- scenario 6b: ebay_us_nonleaf (BASELINE.md fixture, 2311 nodes) ----
    etaxo = from_json("/root/reference/data/raw/ebay/old/ebay_us_nonleaf.json")
    enodes = sorted(n for n in etaxo.nodes if n != 0)
    inputs_e = []
    bases_e = []
    for i in range(0, 40):
        n = enodes[(i * 13) % len(enodes)]
        lbl = etaxo.get_label(n)
        inputs_e.append(lbl + "s" if not lbl.endswith("s") else lbl[:-1])
        bases_e.append([int(n)])
    ejson = {"nodes": [{"id": int(n), "label": etaxo.get_label(n)} for n in sorted(etaxo.nodes)],
             "edges": [{"src": int(u), "tgt": int(v),
                        "label": etaxo.edges[u, v].get("label", "original")}
                       for u, v in etaxo.edges]}
    taxo_e = load(ejson)
    icon_e = ICON(data=taxo_e, emb_model=EmbModel(), gen_model=GenModel(),
                  sub_model=SubModel(), mode="manual", input_concepts=inputs_e,
                  manual_concept_bases=bases_e, do_update=False, logging=False)
    logs_e = icon_e.run()
    goldens["manual_ebay_nonleaf"] = {
        "taxonomy": ejson, "inputs": inputs_e, "bases": bases_e,
        "decisions": decisions_to_json(logs_e),
    }

    # --- scenario 7: category move, search method, google300 ---------------
    from icon.core.category_move import ICONforCategoryMove
    taxo_m = load(gsub)
    icon_m = ICONforCategoryMove(data=taxo_m, emb_model=EmbModel(),
                                 sub_model=SubModel(), mode="auto", method="search",
                                 max_outer_loop=15, do_update=True, logging=False)
    result_m = icon_m.run()
    goldens["move_search_google300"] = {
        "taxonomy": gsub,
        "decisions": [{"target": int(k), "winner": sorted(int(x) for x in v)}
                      for k, v in icon_m._status.logs.items()],
        "final_edges": sorted([[int(u), int(v), result_m.edges[u, v].get("label", "")]
                               for u, v in result_m.edges]),
        "kept": int(icon_m._status.progress[0]), "moved": int(icon_m._status.progress[1]),
    }

    # --- scenario 8: category move, rag method ------------------------------
    taxo_r = load(gsub)
    icon_r = ICONforCategoryMove(data=taxo_r, emb_model=EmbModel(),
                                 sub_model=SubModel(), mode="auto", method="rag",
                                 max_outer_loop=15, do_update=True, logging=False)
    result_r = icon_r.run()
    goldens["move_rag_google300"] = {
        "taxonomy": gsub,
        "decisions": [{"target": int(k), "winner": sorted(int(x) for x in v)}
                      for k, v in icon_r._status.logs.items()],
        "kept": int(icon_r._status.progress[0]), "moved": int(icon_r._status.progress[1]),
    }

    os.makedirs(out_dir, exist_ok=True)
    for name, data in goldens.items():
        with open(f"{out_dir}/{name}.json", "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {out_dir}/{name}.json "
              f"({len(data['decisions'])} decisions)")


if __name__ == "__main__":
    main()
