"""Sequence-variant normalization helpers (M8-M11) and the optional
few-shot LLM predictor (T4).

Reference parity:
- codon -> amino-acid rewrite: sequential str.replace over the RNA table
  then the DNA-only codons, in insertion order
  (/root/reference/src/linker/seq_variant.py:62-117: ``codon_to_rna |
  codon_to_dna`` merged dict, iterated in order).
- tmVar SUB->Allele post-fix: regex ``(c|p)\\|SUB\\|[A-Z]\\|(\\d+)(\\|)?$``;
  on full match rewrite SUB->Allele and strip a trailing '|'
  (seq_variant.py:220-226, 294-301).
- LLM output parsing: split words, keep '|'-containing ones, strip
  ``[^\\w\\s|+-]``; arity rule: exactly 1 candidate -> it, else last, none ->
  '-' (seq_variant.py:272-293).
- few-shot retrieval: top-50 training examples by cosine >= 0.6 against the
  mention embedding, prompt built in tmVar format (seq_variant.py:231-268).

The predictor takes any GenericAPICall-style plugin (bionext_ray.plugins) and
a local examples table — hermetic: no HTTP, no disk cache; memoization is a
plain dict per actor.
"""

from __future__ import annotations

import re

import numpy as np

# Standard genetic code (public domain), RNA codons first then DNA-only
# spellings — merged in the reference's order (seq_variant.py:62-107).
CODON_TO_RNA = {
    'GCU': 'A', 'GCC': 'A', 'GCA': 'A', 'GCG': 'A',
    'CGU': 'R', 'CGC': 'R', 'CGA': 'R', 'CGG': 'R', 'AGA': 'R', 'AGG': 'R',
    'AAU': 'N', 'AAC': 'N',
    'GAU': 'D', 'GAC': 'D',
    'UGU': 'C', 'UGC': 'C',
    'CAA': 'Q', 'CAG': 'Q',
    'GAA': 'E', 'GAG': 'E',
    'GGU': 'G', 'GGC': 'G', 'GGA': 'G', 'GGG': 'G',
    'CAU': 'H', 'CAC': 'H',
    'AUU': 'I', 'AUC': 'I', 'AUA': 'I',
    'UUA': 'L', 'UUG': 'L', 'CUU': 'L', 'CUC': 'L', 'CUA': 'L', 'CUG': 'L',
    'AAA': 'K', 'AAG': 'K',
    'AUG': 'M',
    'UUU': 'F', 'UUC': 'F',
    'CCU': 'P', 'CCC': 'P', 'CCA': 'P', 'CCG': 'P',
    'UCU': 'S', 'UCC': 'S', 'UCA': 'S', 'UCG': 'S', 'AGU': 'S', 'AGC': 'S',
    'ACU': 'T', 'ACC': 'T', 'ACA': 'T', 'ACG': 'T',
    'UGG': 'W',
    'UAU': 'Y', 'UAC': 'Y',
    'GUU': 'V', 'GUC': 'V', 'GUA': 'V', 'GUG': 'V',
    'UAA': '*', 'UGA': '*', 'UAG': '*',
}
CODON_TO_DNA = {
    'GCT': 'A', 'GCC': 'A', 'GCA': 'A', 'GCG': 'A',
    'CGT': 'R', 'CGC': 'R', 'CGA': 'R', 'CGG': 'R', 'AGA': 'R', 'AGG': 'R',
    'AAT': 'N', 'AAC': 'N',
    'GAT': 'D', 'GAC': 'D',
    'TGT': 'C', 'TGC': 'C',
    'CAA': 'Q', 'CAG': 'Q',
    'GAA': 'E', 'GAG': 'E',
    'GGT': 'G', 'GGC': 'G', 'GGA': 'G', 'GGG': 'G',
    'CAT': 'H', 'CAC': 'H',
    'ATT': 'I', 'ATC': 'I', 'ATA': 'I',
    'TTA': 'L', 'TTG': 'L', 'CTT': 'L', 'CTC': 'L', 'CTA': 'L', 'CTG': 'L',
    'AAA': 'K', 'AAG': 'K',
    'ATG': 'M',
    'TTT': 'F', 'TTC': 'F',
    'CCT': 'P', 'CCC': 'P', 'CCA': 'P', 'CCG': 'P',
    'TCT': 'S', 'TCC': 'S', 'TCA': 'S', 'TCG': 'S', 'AGT': 'S', 'AGC': 'S',
    'ACT': 'T', 'ACC': 'T', 'ACA': 'T', 'ACG': 'T',
    'TGG': 'W',
    'TAT': 'Y', 'TAC': 'Y',
    'GTT': 'V', 'GTC': 'V', 'GTA': 'V', 'GTG': 'V',
    'TAA': '*', 'TGA': '*', 'TAG': '*',
}
CODON_AMINO = CODON_TO_RNA | CODON_TO_DNA


def convert_amino_acids(text: str) -> str:
    """M9: order-dependent sequential replace (kept as the exact loop for
    parity, seq_variant.py:109-114)."""
    for three_letter, one_letter in CODON_AMINO.items():
        text = text.replace(three_letter, one_letter)
    return text


_SUB_ALLELE = re.compile(r"(c|p)\|SUB\|[A-Z]\|(\d+)(\|)?$")


def filter_sub_w_allele(seq: str) -> bool:
    """M10 predicate (seq_variant.py:220-226)."""
    m = _SUB_ALLELE.match(seq)
    return bool(m and m.group() == seq)


def fix_sub_allele(pred: str) -> str:
    """M10 rewrite: SUB -> Allele, strip trailing '|'
    (seq_variant.py:294-301)."""
    if filter_sub_w_allele(pred):
        pred = pred.replace("SUB", "Allele")
        if pred and pred[-1] == "|":
            pred = pred[:-1]
    return pred


def parse_llm_words(model_out: str) -> str:
    """M11: pick the tmVar candidate from free-form LLM output
    (seq_variant.py:272-293)."""
    words = (model_out or "").split()
    candidates = [re.sub(r"[^\w\s\|+-]", "", w) for w in words if "|" in w]
    if len(candidates) == 1:
        pred = candidates[0]
    elif len(candidates) == 0:
        pred = "-"
    else:
        pred = candidates[-1]
    return fix_sub_allele(pred)


_PROMPT_HEADER = """As a biomedical expert, your role involves accurately \
associating sequence variances with their corresponding identifiers, \
following tmVar annotation guidelines.

Key Annotation Rules:

Substitution: <Sequence type>|SUB|<wild type>|<mutation position>|<mutant>
Deletion: <Sequence type>|DEL|<mutation position>|<mutant>
Insertion: <Sequence type>|INS|<mutation position>|<mutant>
Insertion + Deletion (indel/delins): <Sequence type>|INDEL|<mutation position>|<mutant>
Duplication: <Sequence type>|DUP|<mutation position>|<mutant>|<duplication times>
Frame shift: <Sequence type>|FS|<wild type>|<mutation position>|<mutant>|<frame shift position>
Sequence types include DNA (c), RNA (r), Genome (g), Protein (p), and \
Mitochondrial (m) sequences.

Examples provided for your reference:

"""


class LLMVariantPredictor:
    """T4: few-shot tmVar normalization through a pluggable LLM.

    examples: [(mention, code, gene_symbol)] — the local stand-in for the
    reference's BioRED-derived example store. Retrieval: top-k cosine >=
    threshold against the surrogate mention embedding (seq_variant.py:
    241-267: torch.topk(k=50), threshold 0.6). Results memoized per actor.
    """

    def __init__(self, llm_call, examples: list[tuple[str, str, str]],
                 k: int = 50, threshold: float = 0.6):
        from ..embedding import embed_batch
        self.llm_call = llm_call
        self.examples = list(examples)
        self.k = k
        self.threshold = threshold
        self.matrix = embed_batch([e[0] for e in self.examples])
        self.cache: dict[tuple[str, str], str] = {}

    def __call__(self, text: str, gene: str) -> str:
        key = (text, gene)
        if key in self.cache:
            return self.cache[key]
        from ..embedding import embed_text
        prompt = _PROMPT_HEADER
        if len(self.examples):
            scores = self.matrix @ embed_text(text)
            order = np.argsort(-scores)[:self.k]
            for idx in order:
                if scores[idx] > self.threshold:
                    mention, code, gene_sym = self.examples[int(idx)]
                    prompt += f"Gene: {gene_sym} Mention: {mention} Code: {code}\n"
        prompt += ("Now, complete the last entry:\n"
                   f"Gene: {gene} Mention: {text} Code: ")
        pred = parse_llm_words(self.llm_call.run(prompt))
        if len(self.cache) < 1_000_000:
            self.cache[key] = pred
        return pred
