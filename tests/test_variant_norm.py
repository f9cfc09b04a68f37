"""M9/M10/M11 + optional LLM tier (T4)."""

from bionext_ray.functions.variant_norm import (LLMVariantPredictor,
                                                convert_amino_acids,
                                                filter_sub_w_allele,
                                                fix_sub_allele,
                                                parse_llm_words)
from bionext_ray.plugins import GenericAPICall


def test_codon_rewrite_order_dependent():
    # RNA codon
    assert convert_amino_acids("GCU") == "A"
    # DNA codon
    assert convert_amino_acids("GCT") == "A"
    # sequential replaces: overlapping text rewrites left-to-right per codon
    assert convert_amino_acids("xGAAy") == "xEy"


def test_sub_allele_fix():
    assert filter_sub_w_allele("c|SUB|A|76")
    assert filter_sub_w_allele("p|SUB|V|600|")
    assert not filter_sub_w_allele("c|SUB|A|76|G")  # full SUB with mutant
    assert fix_sub_allele("c|SUB|A|76") == "c|Allele|A|76"
    assert fix_sub_allele("p|SUB|V|600|") == "p|Allele|V|600"
    assert fix_sub_allele("c|SUB|A|76|G") == "c|SUB|A|76|G"  # untouched


def test_parse_llm_words():
    assert parse_llm_words("Code: c|SUB|A|76|G done") == "c|SUB|A|76|G"
    assert parse_llm_words("no pipes here") == "-"
    # multiple candidates -> last
    assert parse_llm_words("a|b then c|d|e") == "c|d|e"
    # punctuation stripped
    assert parse_llm_words("(c|SUB|A|76|G).") == "c|SUB|A|76|G"


class CannedLLM(GenericAPICall):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.prompts = []

    def run(self, prompt):
        self.prompts.append(prompt)
        return "Code: c|SUB|A|76|G"


def test_llm_predictor_retrieval_and_memo():
    llm = CannedLLM()
    examples = [("c.76A>G", "c|SUB|A|76|G", "SPARK"),
                ("p.V600E", "p|SUB|V|600|E", "BRAF"),
                ("zzzz", "x|y|z", "OTHER")]
    pred = LLMVariantPredictor(llm, examples, k=2, threshold=0.6)
    out = pred("c.76A>G", "SPARK")
    assert out == "c|SUB|A|76|G"
    # identical example retrieved into the prompt (cosine 1.0 > 0.6)
    assert "Mention: c.76A>G Code: c|SUB|A|76|G" in llm.prompts[0]
    # memoized: second call doesn't hit the LLM
    pred("c.76A>G", "SPARK")
    assert len(llm.prompts) == 1


def test_llm_tier_in_linker(ray_session):
    """End-to-end: unlinked variant resolves through the plugin tier."""
    import pyarrow as pa
    import ray.data
    from bionext_ray.kb import default_kb
    from bionext_ray.stages.linker import linker_stage
    from bionext_ray.stages.tagger import MENTION_TYPE, tagger_stage

    kb = default_kb()
    # variant not in variant_lookup ("c.99T/A" normalizes to "c.99T>A SPARK"
    # which is absent) -> llm tier fires
    kb.gazetteer["c.99t/a"] = "SequenceVariant"
    text = "spark carries c.99T/A in customer"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1"], pa.string()),
        "text": pa.array([text], pa.large_string()),
        "title_len": pa.array([0], pa.int32()),
    }))
    tagged = tagger_stage(docs, kb.gazetteer, concurrency=1, batch_size=4)
    linked = linker_stage(
        tagged, kb, concurrency=1, batch_size=4,
        llm_spec={"module": "tests.test_variant_norm:CannedLLM",
                  "kwargs": {}, "examples": [("c.99T>A", "c|SUB|T|99|A", "SPARK")]})
    rows = linked.to_pandas().iloc[0]["mentions"]
    variant = [m for m in rows if m["label"] == "SequenceVariant"]
    assert variant and variant[0]["linked"] == "c|SUB|A|76|G"
