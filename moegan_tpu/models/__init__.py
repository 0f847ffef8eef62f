from moegan_tpu.models.generator import AuroraGenerator, GeneratorOutput
from moegan_tpu.models.discriminator import AuroraDiscriminator

__all__ = ["AuroraGenerator", "GeneratorOutput", "AuroraDiscriminator"]
