# Container image for the graft engine daemon (reference TODO.md:3).
# Build:  docker build -t graft .
# Run:    docker run -v /data:/data graft /data/engine.properties
#
# Base: any Apache Spark 4.x image with Scala 2.13 works; the official
# apache/spark tags ship spark-submit on PATH. The engine jar is built
# outside the image (sbt package) to keep the image free of the sbt
# toolchain — CI artifacts copy in.
FROM apache/spark:4.1.0-scala2.13-java17-ubuntu

COPY target/scala-2.13/*.jar /opt/graft/graft.jar
COPY bin/graft-setup /opt/graft/bin/graft-setup

ENTRYPOINT ["/opt/spark/bin/spark-submit", \
  "--class", "graft.Main", \
  "--master", "local[*]", \
  "/opt/graft/graft.jar"]
CMD ["/data/engine.properties"]
