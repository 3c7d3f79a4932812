"""Training-data-pipeline operators beyond the reference's inventory
(SURVEY §2 "not present in the reference" + the 100 TB training-data
ops): deduplication, similarity search, text analysis, multimodal
plumbing, sessionization.
"""
