"""Large-scale training-data pipeline operators (beyond the reference's
own surface; see BASELINE.json north star):

dedup      — exact, MinHash+LSH, SimHash, n-gram Jaccard
similarity — brute-force cosine top-k; LSH-bucketed ANN for the scale path
text       — language-ID, quality scoring, token counting, fingerprinting
multimodal — binary-column plumbing with stubbed decoders
"""
