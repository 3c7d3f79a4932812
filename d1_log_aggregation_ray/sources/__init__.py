from .readers import read_transcripts, load_side_tables, SideTables

__all__ = ["read_transcripts", "load_side_tables", "SideTables"]
