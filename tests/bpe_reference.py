"""Independent pure-python BPE references (pin sources + test oracles).

Deliberately different formulations from the engine (ops/text.py):
  * ref_bpe_merges — retrains by recounting EVERY pair from scratch
    each round over a dict of space-joined symbol strings (the engine
    trainer keeps incremental pair counts and a pair->words index).
  * ref_encode_len — applies the merge rules ONCE EACH in rank order,
    left-to-right (the original Sennrich formulation); the engine's
    encoder instead loops picking the minimum-rank adjacent pair
    (the GPT-2 formulation).  The two are equivalent because a rule
    can never become applicable again after its pass: later merges
    only create longer symbols, never the rule's operands.
"""

import collections


def ref_bpe_merges(texts, n_merges=60):
    """(rank, left, right, count) rows, the trainer reference."""
    wc = collections.Counter(
        w for t in texts for w in (t or "").split(" ") if w)
    vocab = {" ".join(w): c for w, c in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs = collections.Counter()
        for sw, c in vocab.items():
            syms = sw.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < 2:
            break
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append((rank, best[0], best[1], mx))
        merged = {}
        for sw, c in vocab.items():
            syms = sw.split(" ")
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    ns.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            merged[" ".join(ns)] = merged.get(" ".join(ns), 0) + c
        vocab = merged
    return merges


def ref_encode_word(word, rules):
    """Token list for one word: each (left, right) rule applied once,
    in rank order, merging all occurrences left-to-right."""
    syms = list(word)
    for left, right in rules:
        ns, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                ns.append(left + right)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return syms


def ref_encode_counts(ids, texts, rules):
    """{doc_id: n_tokens} over non-null texts: sum of per-word token
    counts, empty split pieces dropped (the house tokenization)."""
    out = {}
    for did, t in zip(ids, texts):
        if t is None:
            continue
        out[did] = sum(len(ref_encode_word(w, rules))
                       for w in t.split(" ") if w)
    return out
