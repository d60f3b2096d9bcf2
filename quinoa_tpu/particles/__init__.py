from .tracker import ParticleTracker, seed_particles  # noqa: F401
