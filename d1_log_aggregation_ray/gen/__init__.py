from .fixtures import generate_fixtures, fixture_dir, sf_from_dir

__all__ = ["generate_fixtures", "fixture_dir", "sf_from_dir"]
