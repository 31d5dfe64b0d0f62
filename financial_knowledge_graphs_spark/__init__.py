"""financial_knowledge_graphs_spark — a PySpark-native financial knowledge-graph
construction engine.

Built from scratch on the Spark DataFrame API (Catalyst/Tungsten execution,
Arrow-vectorized Python stages). Capability parity target: the reference
pipeline `lucaspons9/financial-knowledge-graphs` (see SURVEY.md) — per-article
LLM extraction loop, Neo4j entity disambiguation, greedy fuzzy evaluation —
re-expressed as distributed, declarative DataFrame stages:

  documents (interleaved text+media spans)
    -> story reconstruction (pure column expressions)
    -> quality filter / dedup                    (operators.prep)
    -> vectorized mention + relation extraction  (operators.extract)
    -> normalization + token-blocked fuzzy link  (operators.normalize/linking)
    -> connected-components canonicalization     (operators.components)
    -> graph materialization w/ merge semantics  (operators.materialize)
    -> greedy bipartite evaluation               (operators.evaluate)

plus the training-data-pipeline operators a 100 TB corpus needs:
dedup (exact/MinHash-LSH/SimHash/n-gram/embedding), ANN similarity search,
text analysis (lang-id, quality, tokens, fingerprints) and multimodal-column
plumbing (operators.dedup / similarity / text / multimodal).
"""

__version__ = "0.1.0"
