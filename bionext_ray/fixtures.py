"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Seeded, no external data. Text bodies are template sentences over the
default KB's surface forms so gold mentions/links/triples are derivable by
construction. Includes the edge rows FIXTURES.md calls for: a document longer
than one 512-token window (window math + decoder stitch), a zero-entity
document, boundary-spanning entities, multi-candidate surfaces for the
majority-vote tie-break, rs-direct and normalized sequence variants, a
composite rsid (comma expansion), and html-vs-text passthrough rows.
"""

from __future__ import annotations

import datetime
import html as _html
import random

import pyarrow as pa

FILLER = ("alpha beta gamma delta quick brown fox jumps over lazy dog "
          "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()

# sentences seeded with KB surfaces (types per bionext_ray.kb.default_kb)
ENTITY_SENTENCES = [
    "the spark gene was upregulated in customer tissue",
    "hash exposure correlated with slow progression",
    "batch treatment reduced slow merge symptoms",
    "vector expression in window cells was elevated",
    "patients carrying rs4242 showed slow phenotype",
    "the c.76A/G variant of spark alters hash binding",
    "stream transcripts were detected in table samples",
    "scan protein interacts with batch metabolites",
    "acetaminophen and hash were co-administered",
    "hela cultures expressed vector at high levels",
    "mouse models lacking spark develop slow merge",
    "md5 dosing improved outcomes in customer cohorts",
    "the p.V600E mutation near spark predicts response to batch",
    "checksum levels rose while sluggish episodes persisted",
    "lag was diagnosed alongside slow in table subjects",
]


def _sentence(rng: random.Random) -> str:
    if rng.random() < 0.55:
        return rng.choice(ENTITY_SENTENCES)
    return " ".join(rng.choice(FILLER) for _ in range(rng.randint(5, 12)))


def make_documents(n_docs: int = 40, seed: int = 7) -> list[dict]:
    """[{doc_id, title, body}] — deterministic."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        title = f"Study {i} of {rng.choice(FILLER)} {rng.choice(FILLER)}"
        n_sent = rng.randint(2, 6)
        body = " ".join(_sentence(rng) for _ in range(n_sent))
        docs.append({"doc_id": str(i), "title": title, "body": body})

    # edge docs (fixed content, appended after the seeded ones)
    nd = n_docs
    long_rng = random.Random(seed + 1)
    long_body = " ".join(_sentence(long_rng)
                         for _ in range(60))  # >> 447 tokens -> multi-window
    docs.append({"doc_id": str(nd), "title": "Long document",
                 "body": long_body})
    docs.append({"doc_id": str(nd + 1), "title": "Empty entities",
                 "body": "nothing of note here just filler words"})
    docs.append({"doc_id": str(nd + 2), "title": "Overlap case",
                 "body": "a slow merge occurred while slow responses and a "
                         "plain merge continued"})
    docs.append({"doc_id": str(nd + 3), "title": "Variant near gene",
                 "body": "the spark gene carries c.76A/G and rs4242 in "
                         "customer samples with slow"})
    docs.append({"doc_id": str(nd + 4), "title": "Backup gene tier",
                 "body": "stream and spark were assayed in table tissue "
                         "with batch"})
    # entity crossing the first window's center boundary: 383 filler tokens,
    # then a two-token entity "slow merge" straddling positions 383-384
    docs.append({"doc_id": str(nd + 5), "title": "Boundary span",
                 "body": " ".join(FILLER[i % len(FILLER)] for i in range(381))
                 + " slow merge afterwards " + " ".join(FILLER[:20])})
    # case-sensitive taxonomy direct tier: "Mouse"/"Rat" hit kb.direct
    # (list and scalar value shapes), lowercase "mouse" falls through to the
    # name dict; neither 10095 nor 10116 is in kb.genes, so nearest-organism
    # for "spark" must skip them and pick the lowercase mouse's 10090
    docs.append({"doc_id": str(nd + 6), "title": "Taxon direct case",
                 "body": "Mouse samples differed from mouse controls while "
                         "Rat strains showed spark expression"})
    # per-tax gene DIRECT tier: "blip" resolves only via
    # kb.direct['GeneOrGeneProduct']['9606']
    docs.append({"doc_id": str(nd + 7), "title": "Per-tax direct gene",
                 "body": "blip transcripts rose in customer tissue "
                         "alongside spark"})
    return docs


def pages_table(docs: list[dict], html_every: int = 2) -> pa.Table:
    """pages rows; every ``html_every``-th row ships raw HTML (text NULL),
    others ship pre-extracted text (title + ' ' + body)."""
    base = datetime.datetime(2024, 1, 1)
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i, d in enumerate(docs):
        urls.append(f"https://example.org/doc/{d['doc_id']}")
        ts.append(base + datetime.timedelta(seconds=i))
        langs.append(["en", "en", "en", "de", "xx"][i % 5])
        if i % html_every == 0:
            paras = d["body"].split(". ")
            body_html = "".join(f"<p>{_html.escape(p)}</p>"
                                for p in ". ".join(paras).split("\n"))
            htmls.append(
                f"<html><head><title>{_html.escape(d['title'])}</title>"
                f"</head><body>{body_html}</body></html>".encode())
            texts.append(None)
        else:
            htmls.append(None)
            texts.append(d["title"] + " " + d["body"])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def expected_text(doc: dict) -> str:
    """The locked extraction rule output for a fixture doc (title + ' ' +
    body; reference join rule /root/reference/src/data.py:34)."""
    return doc["title"] + " " + doc["body"]


def make_pages(n_docs: int = 40, seed: int = 7) -> pa.Table:
    return pages_table(make_documents(n_docs, seed))


def fake_pmid_transport(pmid: str) -> dict:
    """Hermetic stand-in for the NCBI BioC GET (sources/pmid.py): a
    reference-shaped BioC collection for any PMID. Lets the PMID ingest
    source run end-to-end without network (tests, demos)."""
    return {"documents": [{
        "id": str(pmid),
        "passages": [
            {"offset": 0, "text": f"Title {pmid}", "annotations": [
                {"id": "0", "text": "spark",
                 "infons": {"type": "GeneOrGeneProduct",
                            "identifier": "G100"},
                 "locations": [{"offset": 6, "length": 5}]}]},
            {"offset": 12, "text": f"Abstract of {pmid}.",
             "annotations": []},
        ],
    }]}
