// SFA lower-bounding distance golden (SFADistance.java): fit whole-series
// SFA on CBF train, take the first test series as the query, emit the LB
// distance to every train word plus the query's word/DFT.
import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.SFA;
import sfa.transformation.SFADistance;

import java.io.File;
import java.util.Arrays;

public class GoldenGenDist {
    public static void main(String[] args) throws Exception {
        String fix = args[0];
        TimeSeries[] train = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TRAIN"));
        TimeSeries[] test = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TEST"));
        StringBuilder sb = new StringBuilder("{");
        for (boolean normMean : new boolean[]{true, false}) {
            SFA sfa = new SFA(SFA.HistogramType.EQUI_DEPTH);
            short[][] trainWords = sfa.fitTransform(train, 16, 8, normMean);
            SFADistance d = new SFADistance(sfa);
            // query: transform + its DFT values (transformation field)
            TimeSeries q = test[0];
            double[] dftQ = sfa.transformation.transform(q, 16);
            short[] wordQ = sfa.quantization(dftQ);
            sb.append("\"dist_norm" + normMean + "\": {\"word_q\": " + Arrays.toString(wordQ));
            sb.append(", \"dft_q\": " + Arrays.toString(dftQ));
            sb.append(", \"train_words\": [");
            for (int i = 0; i < trainWords.length; i++) {
                if (i > 0) sb.append(",");
                sb.append(Arrays.toString(trainWords[i]));
            }
            sb.append("], \"lb\": [");
            for (int i = 0; i < trainWords.length; i++) {
                if (i > 0) sb.append(",");
                sb.append(d.getDistance(trainWords[i], wordQ, dftQ, normMean, Double.MAX_VALUE));
            }
            sb.append("]}");
            sb.append(normMean ? "," : "");
        }
        sb.append("}");
        System.out.println(sb.toString());
        System.exit(0);
    }
}
